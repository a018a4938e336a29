"""The reference's end-to-end flow, Spark-native (SURVEY §3.2; reference
file:line n/a — empty tree §0.1): worklist → UPC normalize/validate →
delta detection against the target table → paginated REST fetch →
latest-per-key dedup → idempotent upsert → audit counts.

Every stage is one of the engine's own operators (B9/B10, C5, A4, E1/G4,
A7, D2) — the pipeline is composition, not new machinery.  With the
deterministic fake transport the WHOLE flow is a pure function of the
worklist, so the registry exposes it as a hash-checked query: the oracle
reproduces normalize + delta + payload + upsert in plain SQL.

Scale: each stage is shuffle-bounded — normalize is map-only, the
anti-join shuffles on the 13-digit key (broadcastable when the existing-
key set is small), fetch parallelism = page count, the upsert fan-in is
capped by ``max_connections``.  Nothing collects to the driver except
the final audit counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.upc import upc_normalize
from ..sources.db import ConnFactory, db_sink_upsert
from ..sources.rest_api import Transport, fake_transport, fetch_products


def load_upcs(
    worklist: DataFrame,
    existing_keys: DataFrame,
    conn_factory: ConnFactory,
    table: str = "products",
    upc_col: str = "upc_raw",
    page_size: int = 100,
    transport: Transport = fake_transport,
    base_url: str = "https://api.example.com/products",
    auth_token: str | None = None,
    dialect: str = "sqlite",
    max_connections: int = 4,
) -> dict[str, int]:
    """Run the full load; returns audit counts (the reference's load
    accounting — SURVEY §3.2 step 5)."""
    normalized = worklist.select(
        upc_normalize(F.col(upc_col), width=13).alias("upc")
    ).filter(F.length("upc") == 13)

    deduped = normalized.dropDuplicates(["upc"])  # overlapping pages/batches
    # cache: the delta worklist feeds both the audit count and the fetch;
    # it is keys-only, so even a 100 TB load's delta fits executor storage
    delta = deduped.join(
        existing_keys.select(F.col("upc").alias("upc")), on="upc", how="left_anti"
    ).persist()

    products = fetch_products(
        delta,
        upc_col="upc",
        page_size=page_size,
        base_url=base_url,
        transport=transport,
        auth_token=auth_token,
    )

    n_worklist = worklist.count()
    n_delta = delta.count()
    db_sink_upsert(
        products,
        conn_factory=conn_factory,
        table=table,
        key_cols=["upc"],
        dialect=dialect,
        max_connections=max_connections,
    )
    audit = {
        "worklist_rows": n_worklist,
        "delta_rows": n_delta,
        "skipped_existing": deduped.count() - n_delta,
    }
    delta.unpersist()
    return audit
