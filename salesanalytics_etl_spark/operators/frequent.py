"""Distributed heavy-hitters: exact frequent items without a full-domain
shuffle.

A naive frequent-items query (``GROUP BY key HAVING count >= phi*n``)
shuffles every distinct key — at 100 TB of text that is billions of terms
through one exchange to keep the handful that matter. This operator is the
two-pass mergeable-summary rewrite:

1. CANDIDATES — each task condenses its partitions into a Misra-Gries
   summary of capacity ``k`` (``mapInPandas``, Arrow-batched, zero
   shuffle). The mergeable-summaries guarantee (Agarwal et al., PODS'12):
   a key with global frequency > n/(k+1) survives in at least one task's
   summary (pigeonhole over the per-partition bounds), so the union of
   summaries — at most k rows per task, independent of the key domain —
   is a superset of every phi-heavy key whenever ``phi >= 1/(k+1)``.
2. EXACT RECOUNT — the candidate set is broadcast back onto the rows and
   counted exactly; keys whose exact count clears the phi threshold are
   emitted. False candidates from step 1 are filtered here, so the OUTPUT
   is exact and deterministic even though the intermediate sketch depends
   on partition order — which is what makes this oracle-checkable against
   a plain GROUP BY/HAVING twin (unlike the HLL/GK sketches, q64/q82).

Shuffle inventory at scale: one bounded sketch collect (<= k+1 rows per
task, merged driver-side) and one exchange over <= k recounted keys —
never over the full key domain. The threshold compare is integer math
(``freq * denom >= n``), immune to float rounding on both engines.

Reference parity: the reference has no sketch operators; this extends its
surface for corpus-scale token statistics (SURVEY.md north-star ops).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default capacity: supports phi down to 1/1024 with the n/(k+1) bound.
DEFAULT_K = 1024


def _mg_kernel(key_col: str, k: int):
    """Per-task Misra-Gries summarizer.

    Emits up to ``k`` candidate rows (term, cnt) plus one sentinel row
    (term NULL, cnt = rows seen by this task). The batch decrement —
    subtract the (k+1)-th largest count from every counter, drop the
    non-positive — is a prefix of valid MG decrement steps: each round
    pays (k+1) * dec observations, so total decrement per task stays
    <= n_task/(k+1).
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            for term, c in pdf[key_col].value_counts().items():
                counters[term] = counters.get(term, 0) + int(c)
            if len(counters) > k:
                dec = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - dec for t, c in counters.items() if c > dec}
        if n_rows == 0:
            return
        terms = list(counters)
        yield pd.DataFrame(
            {
                key_col: terms + [None],
                "cnt": [counters[t] for t in terms] + [n_rows],
            }
        )

    return run


def heavy_hitters(
    rows: DataFrame,
    key_col: str = "term",
    phi_denom: int = 200,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Exact keys with frequency >= n / ``phi_denom`` (phi = 1/phi_denom).

    ``phi_denom`` must not exceed k: the MG undercount can reach n/(k+1),
    and the output threshold admits frequency >= n/phi_denom, so a key at
    EXACTLY n/(k+1) (admitted when phi_denom = k+1) could be decremented
    out of every summary before the recount. phi_denom <= k keeps the
    qualifying frequencies strictly above the worst-case decrement.
    """
    if phi_denom > k:
        raise ValueError(
            f"phi_denom={phi_denom} needs capacity k >= {phi_denom}, got {k}"
        )
    spark = rows.sparkSession
    # NULL keys are excluded from BOTH passes and from n_total: pandas
    # value_counts drops NaN, so NULL could never surface as a candidate
    # while its rows would still inflate the sentinel total — quietly
    # raising the bar for every real key. The contract is explicitly
    # "frequent among non-NULL keys" (mirror any SQL twin with
    # WHERE key IS NOT NULL).
    src = rows.select(
        F.col(key_col).cast("string").alias(key_col)
    ).filter(F.col(key_col).isNotNull())

    # Reduce step: collect the per-task summaries (BOUNDED — at most k+1
    # rows per task regardless of the key domain; 1000 executors x 1025
    # rows ~ 1M short rows, the standard sketch-collect envelope) and
    # merge them driver-side into one capacity-k MG summary. Merging
    # preserves the superset guarantee (Agarwal et al.: MG summaries are
    # mergeable under add-then-trim), so the merged counter set still
    # contains every key with global frequency > n/(k+1). An earlier
    # version kept the reduce distributed behind a .persist(); the pin
    # outlived the query and accumulated executor memory across a
    # 100-query sweep — the sketch IS small by construction, so the
    # driver merge is both simpler and leak-free.
    counters: dict[str, int] = {}
    n_total = 0
    summ = src.mapInPandas(
        _mg_kernel(key_col, k), schema=f"{key_col} string, cnt long"
    ).toPandas()  # Arrow-batched collect — Py4J Row decoding of the same
    # summary measured ~2-3s at 28k rows, the Arrow path is milliseconds
    import pandas as pd

    for term, cnt in zip(summ[key_col].to_numpy(), summ["cnt"].to_numpy()):
        if pd.isna(term):  # sentinel row: task's exact row count
            n_total += int(cnt)
        else:
            counters[term] = counters.get(term, 0) + int(cnt)
    if len(counters) > k:
        dec = sorted(counters.values(), reverse=True)[k]
        counters = {t: c - dec for t, c in counters.items() if c > dec}

    out_schema = f"{key_col} string, freq long"
    if not counters or n_total == 0:
        return spark.createDataFrame([], schema=out_schema)

    # Exact recount of the candidates only: one scan of the source, one
    # exchange over <= k keys. The threshold compare is integer math
    # against the exact sentinel total, so the OUTPUT is exact and
    # deterministic even though the candidate set is partition-dependent.
    cand = F.broadcast(
        spark.createDataFrame(
            [(t,) for t in counters], schema=f"{key_col} string"
        )
    )
    return (
        src.join(cand, key_col)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * phi_denom >= F.lit(n_total))
        .select(key_col, "freq")
    )
