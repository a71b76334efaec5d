"""Python UDTF surface (SURVEY.md §2.12).

The reference has no UDF/UDAF/UDTF layer at all (pure T-SQL + pandas); this
engine's per-row Python surface is deliberately thin — pandas UDFs for
vectorizable kernels (similarity, multimodal), and ONE table-valued function
here to prove the Spark 4 `@udtf` contract end-to-end (registration,
LATERAL join, oracle parity). UDTFs are a row-at-a-time Python path — the
slowest execution tier — so everything that CAN be a built-in expression is
(the engine's sentence logic elsewhere uses explode(split(..)), e.g. q83);
reach for a UDTF only when per-row logic genuinely needs Python state or
libraries. Arrow transport for UDTFs is enabled session-wide
(``spark.sql.execution.pythonUDTF.arrow.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="sent_id: int, sentence: string")
class SentenceSplit:
    """Split a document into trimmed, non-empty, 1-indexed sentences.

    Matches q83's sentence convention (lower, split on '.', trim) so the
    UDTF path is value-comparable with the codegen'd explode(split())
    path and the DuckDB oracle.
    """

    def eval(self, text: str):  # noqa: D102 — contract defined by @udtf
        if text is None:
            return
        i = 0
        for raw in text.lower().split("."):
            # strip(' ') not strip(): SQL trim (both Spark's and DuckDB's)
            # removes SPACES only, and the oracle's emptiness test must see
            # the same segments — Python's all-whitespace strip would drop
            # a segment that is only '\n', desynchronizing sent_id
            s = raw.strip(" ")
            if s:
                i += 1
                yield i, s


def split_sentences_udtf(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, sent_id, sentence) via the registered UDTF + LATERAL join."""
    spark.udtf.register("sentence_split", SentenceSplit)
    docs.select("doc_id", "text").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_id, s.sentence
        FROM _udtf_docs d, LATERAL sentence_split(d.text) s
        """
    )
