"""Near-duplicate detection for LLM training data: exact (hash groupBy),
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Everything is built-in-function column algebra (no Python UDFs) with
integer arithmetic chosen to be overflow-safe and bit-identical in DuckDB,
so each stage is oracle-gated.

Scale notes (100 TB corpus):
- exact dedup: one groupBy on a 128-bit digest — map-side combine, one
  shuffle of (digest, min_id, count).
- MinHash/LSH: shingle explode is the big intermediate (|docs| × |doc
  shingles|); signatures reduce it to k ints per doc, and the band join
  shuffles only (band_key → doc_id) pairs. Never materializes all-pairs.
- SimHash: one 64-int signature per doc; candidate pairs via banding the
  signature halves (multi-probe extends recall); verification is xor +
  bit_count — pure integer codegen.
- n-gram Jaccard verification only runs on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_cdc_spark.functions.text import fingerprint, normalize_text, tokens

# MinHash parameters — shared constants for the Spark and DuckDB sides.
MINHASH_MOD = 1_000_003          # prime; keeps a*h+b within int64
MINHASH_PARAMS = [(2, 1), (3, 7), (5, 13), (7, 31), (11, 101), (13, 257), (17, 991), (19, 1203)]
MINHASH_K = len(MINHASH_PARAMS)
LSH_BAND_ROWS = 2                # 4 bands × 2 rows

SIMHASH_BITS = 32


def shingles(text_col: Column, k: int = 3) -> Column:
    """k-token shingles of the normalized text (array of strings).
    Documents shorter than k tokens yield their full token string."""
    toks = tokens(normalize_text(text_col))
    n = F.size(toks)
    full = F.array(F.concat_ws(" ", toks))
    sh = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.when(n >= k, sh).otherwise(full)


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on the normalized-text digest: one row per distinct
    content with canonical (min) id and duplicate count."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def balance_partitions(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the cluster parallelism — only when
    the scan produced fewer splits than cores. Shingling/minhashing is
    compute-dense per input byte, and Spark sizes scan partitions by
    BYTES (maxPartitionBytes), so a small-but-expensive corpus otherwise
    runs single-task (parquet can't split below a row group). At real
    corpus scale the input already has ≥cores splits and this is a no-op
    — the shuffle only fires exactly when the layout starves the CPUs."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def doc_shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sh64) exploded-distinct — the shared input of MinHash and
    Jaccard verification. The shingle string is hashed to its 60-bit
    md5-prefix int RIGHT HERE, before the distinct: every downstream
    stage (signature mins, Jaccard joins, the distinct's own shuffle)
    then moves and compares 8-byte ints instead of shingle strings, and
    the expensive md5+base16 parse runs exactly once per shingle
    occurrence rather than once per consuming branch (the round-3 bench
    regression was exactly that recomputation). The DuckDB oracle dedups
    on the same hashed domain, so parity is exact by construction —
    60-bit collisions included."""
    sh64 = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("long")
    return (
        balance_partitions(docs)
        .select(F.col(id_col), F.explode(shingles(F.col(text_col))).alias("shingle"))
        .select(F.col(id_col), sh64.alias("sh64"))
        .distinct()
    )


def minhash_signatures(
    shingled: DataFrame, id_col: str = "doc_id", with_sizes: bool = False
) -> DataFrame:
    """k-permutation MinHash signature per document: h_i = min over
    shingles of (a_i * H + b_i) mod P, H = the pre-hashed shingle int
    mod P. One groupBy with k min-aggregates — map-side combined.

    ``with_sizes`` adds the per-doc distinct-shingle count ``n_sh`` to the
    same aggregate: callers that need set sizes later (Jaccard
    verification) get them from this one pass over the exploded shingle
    table instead of paying a second groupBy over it."""
    h = F.col("sh64") % MINHASH_MOD
    aggs = [
        F.min((F.lit(a) * h + F.lit(b)) % MINHASH_MOD).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    if with_sizes:
        aggs.append(F.count(F.lit(1)).alias("n_sh"))
    return shingled.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signature (bands of LSH_BAND_ROWS rows) and emit distinct
    candidate pairs (a < b) sharing any band. The join key is
    (band_index, band_value-string): only same-bucket docs ever meet.

    ``max_bucket_size`` drops band buckets holding more than that many
    documents BEFORE the self-join: one boilerplate-heavy bucket of m docs
    otherwise emits m·(m−1)/2 pairs — quadratic in the hot bucket, the
    classic LSH skew blowup at corpus scale. Dropped buckets are almost
    always templated boilerplate whose members exact-dedup catches anyway;
    the recall cost is the documented trade (a deliberate, deterministic
    cap — NOT silent truncation: both the Spark plan and the DuckDB oracle
    apply the same predicate)."""
    n_bands = MINHASH_K // LSH_BAND_ROWS
    # one bigint bucket key per band: fold (band_index, row values) with
    # base MINHASH_MOD — a bijection, since every mh < MINHASH_MOD. The
    # self-join and the skew cap then key on a single 8-byte int instead
    # of a (int, concatenated-string) pair: cheaper to build, hash,
    # shuffle, and compare, with identical bucket membership.
    def band_key(bi: int) -> Column:
        k: Column = F.lit(bi).cast("long")
        for r in range(LSH_BAND_ROWS):
            k = k * MINHASH_MOD + F.col(f"mh{bi * LSH_BAND_ROWS + r}")
        return k

    bands = F.array(*[band_key(bi) for bi in range(n_bands)])
    banded = signatures.select(
        F.col(id_col), F.explode(bands).alias("bkey")
    )
    if max_bucket_size is not None:
        # the oversized-bucket list is tiny (hot boilerplate buckets):
        # aggregate with map-side combine and anti-broadcast it — cheaper
        # than a window count, which would sort every partition of the
        # full banded set just to attach a per-bucket size
        big = (
            banded.groupBy("bkey")
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .filter(F.col("__bsz") > max_bucket_size)
            .select("bkey")
        )
        banded = banded.join(F.broadcast(big), ["bkey"], "left_anti")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    shingled: DataFrame,
    candidates: DataFrame | None = None,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for pairs. With ``candidates`` given,
    only verifies those (the LSH path — linear-ish work); without, blocks
    on shared shingles (still avoids the full cross join: pairs sharing
    zero shingles are never generated). Input is doc_shingles' hashed
    (id, sh64) form — joins compare 8-byte ints, never shingle strings.

    ``sizes`` (id_col, n_sh) lets callers reuse a count already produced
    elsewhere (minhash_signatures with_sizes=True) and skip this
    function's own groupBy over the exploded shingle table."""
    hashed = shingled.select(F.col(id_col), "sh64")
    a = hashed.select(F.col(id_col).alias("id_a"), "sh64")
    b = hashed.select(F.col(id_col).alias("id_b"), "sh64")
    if candidates is not None:
        # candidate-first: expand candidates by id_a's shingles, then keep
        # those id_b also has — work is O(|candidates| × shingles/doc),
        # never the full shared-shingle pair space
        inter = (
            candidates.join(a, "id_a")
            .join(b, ["id_b", "sh64"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        inter = (
            a.join(b, ["sh64"])
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    if sizes is None:
        sizes = hashed.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dup_clusters(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id)
    with cluster_id = the smallest doc_id in the component. This is the
    final step of corpus dedup: keep one representative per cluster
    (``filter(doc_id == cluster_id)``), drop the rest.

    Iterative min-label propagation: every node starts labeled with its
    own id; each round a node adopts the minimum label among itself and
    its neighbors; converged when no label changes. Rounds needed = graph
    diameter — near-dup components are shallow (stars/chains of a few
    hops), so convergence is fast; ``max_iters`` guards degenerate
    chains. Each round is one join + one groupBy (shuffle on node id);
    ``localCheckpoint`` truncates the lineage so the plan doesn't grow
    per iteration — without it, iteration k replans k joins deep.

    The driver-side loop only reads a per-round changed-count (one
    scalar), not data — the operator stays fully distributed.

    Expects ``pairs`` with columns (id_a, id_b); singleton documents
    (never paired) are not emitted — they are their own clusters.
    """
    edges_one = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    edges = edges_one.union(
        edges_one.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("lbl"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neigh_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id2"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        updated = (
            labels.join(neigh_min, labels.id == neigh_min.id2, "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias(
                    "new_lbl"
                ),
                "lbl",
            )
            .localCheckpoint()
        )
        changed = updated.filter(F.col("new_lbl") != F.col("lbl")).count()
        labels = updated.select("id", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("id").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SIMHASH_BITS-bit SimHash per document from token counts: bit b is
    the sign of Σ_tokens count · (2·bit_b(hash(token)) − 1). All-integer
    arithmetic — exact cross-engine parity, no float knife edges."""
    tok = (
        balance_partitions(docs)
        .select(F.col(id_col), F.explode(tokens(normalize_text(F.col(text_col)))).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    bit_sums = [
        F.sum(
            F.col("cnt") * (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    per_doc = tok.groupBy(id_col).agg(*bit_sums)
    sim = sum(
        (
            F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(SIMHASH_BITS)
        ),
        start=F.lit(0),
    )
    return per_doc.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash_pairs(
    sims: DataFrame, id_col: str = "doc_id", max_hamming: int = 6
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on signature
    halves (a pair within hamming ≤ 6 usually agrees on one 16-bit half;
    full recall needs more bands — documented tradeoff). Verification is
    xor + bit_count, pure integer codegen."""
    half_lo = F.col("simhash").bitwiseAND(F.lit((1 << 16) - 1))
    half_hi = F.shiftright(F.col("simhash"), 16).bitwiseAND(F.lit((1 << 16) - 1))
    blocked = sims.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("half"), half_lo.alias("key")),
                F.struct(F.lit(1).alias("half"), half_hi.alias("key")),
            )
        ).alias("b"),
    ).select(id_col, "simhash", F.col("b.half").alias("half"), F.col("b.key").alias("key"))
    l, r = blocked.alias("l"), blocked.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.half") == F.col("r.half"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
