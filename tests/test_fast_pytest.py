"""Pin the sharded runner's stale-log hygiene (r7 verdict item 6): a
``_shard*.log`` left behind by an earlier wider run must be deleted
before launching, so a reader tallying shard logs never sees a phantom
failure from a dead session."""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.fast_pytest import _clear_stale_shard_logs  # noqa: E402


def test_clear_stale_shard_logs_removes_only_beyond_count(tmp_path):
    for i in range(6):
        (tmp_path / f"_shard{i}.log").write_text("1 failed")
    (tmp_path / "_shardX.log").write_text("not a shard index — untouched")
    _clear_stale_shard_logs(4, tmp_path)
    assert sorted(p.name for p in tmp_path.glob("_shard*.log")) == [
        "_shard0.log",
        "_shard1.log",
        "_shard2.log",
        "_shard3.log",
        "_shardX.log",
    ]


def test_clear_stale_shard_logs_missing_dir_is_noop(tmp_path):
    _clear_stale_shard_logs(4, tmp_path / "does-not-exist")  # must not raise
