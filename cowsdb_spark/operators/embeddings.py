"""Model-free document embeddings via the hashing trick.

``hashed_embedding`` maps a document to a ``dim``-bucket vector of
hashed-token counts (Weinberger et al. 2009, "Feature Hashing for
Large Scale Multitask Learning") — the embedding column that lets a
corpus WITHOUT a neural encoder run the package's entire dense lane:
``embedding_neardup_pairs`` (cosine near-dup), ``semdedup``,
``ivf_pq_build`` + ANN, all take this column as-is. Cosine between
hashed vectors estimates the token-multiset cosine of the documents
(collisions only ADD mass, bounded by token-count/dim), so near-dups
rank high exactly as with the n-gram Jaccard lanes — at the cost of
one slim aggregation instead of a pairwise gram pipeline.

Spark-first shape: explode tokens → pmod(hash) bucket → ONE
map-side-combinable (id, bucket) count aggregate (the exchange
carries at most min(doc_len, dim) slim rows per doc — the same
per-doc volume the MinHash signature pass shuffles) → per-doc dense
assembly (≤ dim rows each). Pure whole-stage codegen, zero UDF.
``hash_fn='md5'`` derives buckets from the top 60 bits of md5 (the
dedup.py oracle lane) so the whole vector is DuckDB-replicable (t56).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "\x1fhemb"


def _bucket(tok, dim: int, hash_fn: str):
    salted = F.concat(tok, F.lit(_SALT))
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(salted)
    return F.pmod(h, F.lit(dim))


def hashed_embedding(
    docs: DataFrame,
    dim: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    normalize: bool = True,
) -> DataFrame:
    """(id, embedding): hashed token-count vector per document —
    ``array<double>`` L2-normalized when ``normalize`` (the form the
    cosine operators expect; all-empty docs yield the zero vector),
    else the raw ``array<long>`` counts (exact — the t56 oracle
    form). Tokens are whitespace splits of the raw text; empty
    strings don't count."""
    if dim < 1:
        raise ValueError("hashed_embedding: dim must be >= 1")
    tok = F.explode(F.split(F.col(text_col), " ")).alias("_tok")
    # r9: two-level aggregate — (id, token) occurrence counts first,
    # then bucket-hash each DISTINCT (id, token) once and sum the
    # weights. The bucket hash (md5 in the oracle lane) previously ran
    # per token OCCURRENCE; counts are identical by the distributive
    # law, and both exchanges carry partially-aggregated narrow rows.
    counts = (
        docs.select(F.col(id_col), tok)
        .filter(F.col("_tok") != "")
        .groupBy(id_col, "_tok")
        .agg(F.count(F.lit(1)).alias("_c0"))
        .groupBy(
            id_col, _bucket(F.col("_tok"), dim, hash_fn).cast("int").alias("_b")
        )
        .agg(F.sum("_c0").alias("_c"))
    )
    assembled = counts.groupBy(id_col).agg(
        F.map_from_arrays(F.collect_list("_b"), F.collect_list("_c")).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0).cast("bigint")),
    )
    if not normalize:
        return assembled.select(id_col, dense.alias("embedding"))
    withv = assembled.select(id_col, dense.alias("_v"))
    norm = F.sqrt(
        F.aggregate(
            "_v", F.lit(0).cast("bigint"), lambda a, x: a + x * x
        ).cast("double")
    )
    unit = F.transform(
        "_v",
        lambda x: F.when(norm > 0, x.cast("double") / norm).otherwise(
            F.lit(0.0)
        ),
    )
    return withv.select(id_col, unit.alias("embedding"))
