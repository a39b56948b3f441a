"""The fused Arrow minhash-signature kernel must return exactly the rows
of the expression form (shingle transform + md5 + 16-min aggregate) — all
integer arithmetic, so equality is exact, not approximate (r12: the
interpreted shingle lambda cost ~2.5 s per 2500-doc micro-batch in the
CDC signature maintainer; the kernel is ~6x cheaper)."""

import pytest
from pyspark.sql import functions as F

from pypgcdc_spark.operators.cdc_dedup import _shingles_of
from pypgcdc_spark.operators.dedup import (
    minhash_signatures_from_text,
    minhash_signatures_wide,
)
from pypgcdc_spark.queries import load


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_fused_kernel_matches_expression_form(spark, sf_dir):
    (docs,) = load(spark, sf_dir, "documents")
    docs = docs.select("doc_id", "text")
    ref = sorted(
        tuple(r) for r in minhash_signatures_wide(_shingles_of(docs)).collect()
    )
    fused = sorted(
        tuple(r) for r in minhash_signatures_from_text(docs).collect()
    )
    assert fused == ref


def test_fused_kernel_skips_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "a b c"), (3, "")], "doc_id LONG, text STRING"
    )
    out = minhash_signatures_from_text(docs).collect()
    assert [r.doc_id for r in out] == [2]  # <3 words yield no signature row
