"""A16: custom source via Spark 4's Python Data Source API.

The reference engine's defining input is a UPC worklist; this source
generates one natively inside Spark's source framework instead of
`createDataFrame`-ing driver-side rows: ``spark.read.format(
"upc_worklist")`` plans one InputPartition per range shard, and each
executor materializes ONLY its shard — the worklist never exists in
one place.  That is the Python-DataSource contract that matters at
scale: partition planning on the driver is O(#partitions), row
generation is executor-side and parallel.

The rows are deterministic: ``seq`` ∈ [0, n) and the 12-digit UPC-A
whose body is seq zero-padded to 11 digits plus the GS1 mod-10 check
digit — so a plain SQL twin can regenerate the identical relation.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


def _check_digit(body: str) -> int:
    """GS1 mod-10: weight 3 on odd positions from the RIGHT (pure-Python
    twin of functions/upc.py:gtin_check_digit, which is Column-based)."""
    n = len(body)
    total = sum(
        int(ch) * (3 if (n - i) % 2 == 1 else 1) for i, ch in enumerate(body)
    )
    return (10 - total % 10) % 10


class UpcWorklistDataSource(DataSource):
    """``format("upc_worklist")`` — options: n (rows), numPartitions."""

    @classmethod
    def name(cls) -> str:
        return "upc_worklist"

    def schema(self) -> str:
        return "seq bigint, upc string"

    def reader(self, schema) -> "UpcWorklistReader":  # noqa: ANN001
        return UpcWorklistReader(self.options)

    def streamReader(self, schema) -> "UpcWorklistStreamReader":  # noqa: ANN001
        return UpcWorklistStreamReader(self.options)


class UpcWorklistReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 2000))
        self.num_partitions = int(options.get("numpartitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        # contiguous range shards; the driver plans only (start, end) pairs
        per = -(-self.n // self.num_partitions)
        return [
            InputPartition((i * per, min((i + 1) * per, self.n)))
            for i in range(self.num_partitions)
            if i * per < self.n
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        start, end = partition.value
        for seq in range(start, end):
            body = str(seq).zfill(11)
            yield (seq, body + str(_check_digit(body)))


# --- Streaming reader (Spark 4 Python Data Source streaming API) --------------


class UpcWorklistStreamReader(DataSourceStreamReader):
    """``readStream.format("upc_worklist")`` — offsets are plain row
    counts; each micro-batch covers a contiguous ``seq`` range split
    into range-shard partitions, so replay from any committed offset
    regenerates identical rows (exactly-once with an idempotent sink).

    Implements the DataSourceStreamReader contract (initialOffset /
    latestOffset / partitions / read / commit).
    """

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 2000))
        self.num_partitions = int(options.get("numpartitions", 4))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        # the available end of the stream; availableNow snapshots this
        # once and drains [initial, latest) — a live trigger would poll
        # it repeatedly as the upstream worklist grows
        return {"pos": self.n}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start["pos"], end["pos"]
        if hi <= lo:
            return [InputPartition((lo, lo))]
        per = -(-(hi - lo) // self.num_partitions)
        return [
            InputPartition((lo + i * per, min(lo + (i + 1) * per, hi)))
            for i in range(self.num_partitions)
            if lo + i * per < hi
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        start, end = partition.value
        for seq in range(start, end):
            body = str(seq).zfill(11)
            yield (seq, body + str(_check_digit(body)))

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass
