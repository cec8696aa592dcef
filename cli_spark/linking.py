"""Stage 2 — entity linking: MinHash-LSH candidate generation + salted
hash-join scoring (SURVEY.md §2.3 J4, BASELINE.json north_star).

Two linkers:

- :func:`link_near_dup_files` — content near-duplicate detection.
  shingle → minhash → band → bucket-join → signature-agreement scoring,
  emitting ``kg:sameAs`` triples between file IRIs. This is the LSH
  showcase; ground truth is the planted clone pairs
  (:func:`cli_spark.corpus.expected_dup_pairs`).
- :func:`link_modules_cross_lang` — exact-name module linking across
  languages (equi-join on the module local name) — the cheap path that
  needs no sketch.

Scale design (the part that must survive 100 TB):
- The shingle explosion is the widest point: ``(file, shingle_hash)``
  distinct pairs. Hashing is ``xxhash64`` (JVM, codegen) — no Python.
- One shuffle builds signatures: groupBy(file).agg(min(h_0)..min(h_K)),
  map-side partial agg keeps it linear.
- Banding self-join is an equi-join on (band_id, band_hash); **hot
  buckets are capped** (a bucket with B members yields B² pairs — a
  degenerate near-identical cluster; we keep the first MAX_BUCKET
  members by file id, which still links every member transitively
  through the kept ones via connected components downstream).
- Pair scoring re-joins candidates to the signature table on a salted
  key (file id is already high-cardinality; AQE skew-join handles
  residual skew from mega-repos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpus import KIND_IRI, PRED_SAME_AS

NUM_PERM = 32
BAND_ROWS = 4  # 8 bands × 4 rows
SHINGLE_WORDS = 3
MAX_BUCKET = 20
# Mersenne prime 2^31-1: base hashes are reduced onto the FULL domain
# [0, p) so the linear map a*h+b mod p wraps ~a times — a proper
# 2-universal permutation. (With h in a small sub-range of a large
# modulus the map is piecewise-monotone and min-hash degenerates to
# "globally smallest h wins every permutation".)
MERSENNE = (1 << 31) - 1

# Deterministic (a, b) permutation parameters — fixed seed 42 expansion
# via a simple LCG so the pipeline is reproducible without RNG at runtime.
def _perm_params(n: int = NUM_PERM) -> list[tuple[int, int]]:
    params = []
    state = 42
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (MERSENNE - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MERSENNE
        params.append((a, b))
    return params


def file_shingles(repos: DataFrame) -> DataFrame:
    """(file_iri, shingle_hash) distinct — word SHINGLE_WORDS-grams hashed
    to 32 bits (xxhash64 & 0xFFFFFFFF keeps products within int64)."""
    file_iri = F.format_string(
        "kg:file/%s/%s@%s", F.col("repo"), F.col("path"), F.col("commit")
    )
    words = F.filter(F.split(F.col("content"), r"\s+"), lambda w: w != "")
    n = F.size(words)
    shingles = F.when(
        n >= SHINGLE_WORDS,
        F.transform(
            F.sequence(F.lit(0), n - SHINGLE_WORDS),
            lambda i: F.concat_ws(
                " ",
                F.element_at(words, i + 1),
                F.element_at(words, i + 2),
                F.element_at(words, i + 3),
            ),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    return (
        repos.select(file_iri.alias("file_iri"), F.explode(shingles).alias("shingle"))
        .select(
            "file_iri",
            F.pmod(F.xxhash64(F.col("shingle")), F.lit(MERSENNE)).alias("h"),
        )
        .distinct()
    )


def minhash_signatures(repos: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """(file_iri, sig: array<long>) — one shuffle, K min-aggregates."""
    sh = file_shingles(repos)
    params = _perm_params(num_perm)
    # h < 2^31 and a < 2^31 ⇒ a*h + b < 2^63: no int64 overflow before pmod.
    aggs = [
        F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(MERSENNE))).alias(f"s{i}")
        for i, (a, b) in enumerate(params)
    ]
    sigs = sh.groupBy("file_iri").agg(*aggs)
    return sigs.select(
        "file_iri", F.array(*[F.col(f"s{i}") for i in range(num_perm)]).alias("sig")
    )


def lsh_candidate_pairs(sigs: DataFrame, band_rows: int = BAND_ROWS) -> DataFrame:
    """(left_iri, right_iri) candidates sharing ≥1 LSH band bucket."""
    num_perm = NUM_PERM
    n_bands = num_perm // band_rows
    bands = sigs.select(
        "file_iri",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",", F.slice(F.col("sig"), b * band_rows + 1, band_rows)
                    )
                ),
            )
        ).alias("band_id", "band_hash"),
    )
    # Cap degenerate buckets: keep MAX_BUCKET members (ordered by iri) —
    # everything in a huge bucket is near-identical; transitive closure
    # downstream reconnects members through the kept representatives.
    from pyspark.sql.window import Window as W

    wb = W.partitionBy("band_id", "band_hash").orderBy("file_iri")
    capped = bands.withColumn("rk", F.row_number().over(wb)).filter(
        F.col("rk") <= MAX_BUCKET
    )
    left = capped.select("band_id", "band_hash", F.col("file_iri").alias("left_iri"))
    right = capped.select("band_id", "band_hash", F.col("file_iri").alias("right_iri"))
    return (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("left_iri") < F.col("right_iri"))
        .select("left_iri", "right_iri")
        .distinct()
    )


def score_pairs(
    candidates: DataFrame, sigs: DataFrame, threshold: float = 0.7
) -> DataFrame:
    """Signature-agreement scoring: fraction of equal minhash positions
    estimates Jaccard. Two hash-joins against the signature table; AQE
    skew-join splits any residual hot key (mega-repo files)."""
    ls = sigs.select(F.col("file_iri").alias("left_iri"), F.col("sig").alias("lsig"))
    rs = sigs.select(F.col("file_iri").alias("right_iri"), F.col("sig").alias("rsig"))
    scored = (
        candidates.join(ls, "left_iri")
        .join(rs, "right_iri")
        .withColumn(
            "score",
            F.size(F.filter(F.zip_with("lsig", "rsig", lambda a, b: a == b), lambda x: x))
            / F.lit(NUM_PERM),
        )
    )
    return scored.filter(F.col("score") >= threshold).select(
        "left_iri", "right_iri", "score"
    )


def link_near_dup_files(repos: DataFrame, threshold: float = 0.7) -> DataFrame:
    """sameAs triples between near-duplicate files (FIXTURES.md clones)."""
    # Signatures feed both the banding join and the scoring join —
    # persist so the shingle explosion runs once (spills to disk at scale).
    sigs = minhash_signatures(repos).persist()
    pairs = score_pairs(lsh_candidate_pairs(sigs), sigs, threshold)
    return pairs.select(
        F.col("left_iri").alias("subj"),
        F.lit(PRED_SAME_AS).alias("pred"),
        F.col("right_iri").alias("obj"),
        F.lit(KIND_IRI).alias("obj_kind"),
    )


def link_modules_cross_lang(triples: DataFrame) -> DataFrame:
    """Module IRIs are already canonical (kg:mod/{name}) across languages
    in this corpus; symbol IRIs are language-scoped (kg:sym/{lang}/{name}).
    Link same-named symbols across languages: sameAs(kg:sym/a/N, kg:sym/b/N)
    for every pair of langs mentioning N — candidate join on local name.
    """
    syms = (
        triples.filter(F.col("obj").startswith("kg:sym/"))
        .select(F.col("obj").alias("iri"))
        .distinct()
        .withColumn("name", F.element_at(F.split(F.col("iri"), "/"), -1))
    )
    a = syms.select(F.col("iri").alias("subj"), "name")
    b = syms.select(F.col("iri").alias("obj"), "name")
    return (
        a.join(b, "name")
        .filter(F.col("subj") < F.col("obj"))
        .select(
            "subj",
            F.lit(PRED_SAME_AS).alias("pred"),
            "obj",
            F.lit(KIND_IRI).alias("obj_kind"),
        )
    )
