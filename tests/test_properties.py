"""Property-based checks (hypothesis) for the reference-semantics core.

The reference defines dedupe as pandas ``drop_duplicates(keep="last")``
(etl_sales_analytics.py:186) and MERGE as update-all-columns-or-insert
(etl_sales_analytics.py:223-283). Example-based tests pin known cases;
these properties assert the DISTRIBUTED implementations agree with the
single-node reference semantics on arbitrary inputs — keys with any
duplicate multiplicity, any seq ordering, any batch overlap.

Spark session startup dominates per-example cost, so examples are few and
small; the value is the adversarial shapes hypothesis finds (all-same-key,
interleaved seq ties broken by later columns, empty batches), not volume.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from salesanalytics_etl_spark.operators.cleaning import dedupe_keep_last
from salesanalytics_etl_spark.operators.upsert import merge_upsert

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key: few values → many dups
        st.integers(min_value=0, max_value=100),  # payload
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(_rows)
@_SETTINGS
def test_dedupe_keep_last_matches_pandas(spark, data):
    # stamp file order as _seq, exactly like read_csv_exact(with_seq=True)
    pdf = pd.DataFrame(
        [(k, v, i) for i, (k, v) in enumerate(data)],
        columns=["k", "v", "_seq"],
    )
    want = (
        pdf.sort_values("_seq")
        .drop_duplicates(subset=["k"], keep="last")
        .set_index("k")["v"]
        .to_dict()
    )
    df = spark.createDataFrame(pdf, "k INT, v INT, _seq INT").repartition(3)
    got = {
        r.k: r.v
        for r in dedupe_keep_last(df, keys=["k"], order_col="_seq").collect()
    }
    assert got == want


@given(_rows, _rows)
@_SETTINGS
def test_merge_upsert_matches_dict_update(spark, base, batch):
    # reference MERGE: end state == dict(base) updated by dict(batch),
    # where each input is itself key-deduped keep-last first (the pipeline
    # dedupes before staging, as the reference does)
    def last_wins(rows):
        return {k: v for k, v in rows}

    want = last_wins(base)
    want.update(last_wins(batch))

    def df_of(rows):
        pdf = pd.DataFrame(
            [(k, v, i) for i, (k, v) in enumerate(rows)],
            columns=["k", "v", "_seq"],
        )
        d = spark.createDataFrame(pdf, "k INT, v INT, _seq INT")
        return dedupe_keep_last(d, keys=["k"], order_col="_seq")

    got = {
        r.k: r.v
        for r in merge_upsert(df_of(base), df_of(batch), keys=["k"]).collect()
    }
    assert got == want
