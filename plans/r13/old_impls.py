"""Round-12 (HEAD f3f1a83) implementations of the queries rewritten in
round 13, copied verbatim for one-session interleaved A/B (the host's
cross-process speed scatter — probe 0.23-1.36 observed — makes separate
processes incomparable). Measurement-only; never imported by the engine."""
from __future__ import annotations

from pyspark.sql import functions as F

from convex_batch_processor_spark.catalog import load_table
from convex_batch_processor_spark.llmops.dedup import (
    shingles_from_tokens,
    tokens_col,
)

_TRI_HOT_PART = 20
_LPA_HOT_PART = 20
_LPA_ROUNDS = 3
_MB_MIN_SUPPORT = 5


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def old_ngram_novelty_score(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col("text").alias("t"))
    grams = toks.select(
        "doc_id", F.explode(shingles_from_tokens(F.col("t"), 8)).alias("gram")
    ).persist()
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("long")
    return (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_grams")).alias("novelty"),
        )
    )


def old_market_basket_rules(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              li.l_partkey == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("item"))
        .distinct()
        .persist()
    )
    nb = baskets.agg(F.countDistinct("basket").alias("n"))
    freq = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("n_i"))
    co = (
        baskets.select("basket", F.col("item").alias("item_a"))
        .join(baskets.select("basket", F.col("item").alias("item_b")), "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _MB_MIN_SUPPORT)
    )
    fa = freq.select(F.col("item").alias("item_a"), F.col("n_i").alias("na"))
    fb = freq.select(F.col("item").alias("item_b"), F.col("n_i").alias("nb_i"))
    return (
        co.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb), "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            (F.col("n_ab").cast("double") / F.col("n").cast("double")).alias("support"),
            (F.col("n_ab").cast("double") / F.col("na").cast("double")).alias(
                "conf_a_to_b"
            ),
            (F.col("n_ab").cast("double") / F.col("nb_i").cast("double")).alias(
                "conf_b_to_a"
            ),
            (
                (F.col("n_ab") * F.col("n")).cast("double")
                / (F.col("na") * F.col("nb_i")).cast("double")
            ).alias("lift"),
        )
    )


def old_supplier_triangles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    ok = ps.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n")).filter(
        (F.col("n") >= 2) & (F.col("n") <= _TRI_HOT_PART)
    ).select("l_partkey")
    a = ps.select("l_partkey", F.col("l_suppkey").alias("sa")).join(ok, "l_partkey")
    b = ps.select("l_partkey", F.col("l_suppkey").alias("sb"))
    edges = (
        a.join(b, "l_partkey")
        .filter(F.col("sa") < F.col("sb"))
        .select("sa", "sb")
        .distinct()
        .persist()
    )
    e1 = edges.select(F.col("sa").alias("a"), F.col("sb").alias("b"))
    e2 = edges.select(F.col("sa").alias("b"), F.col("sb").alias("c"))
    e3 = edges.select(F.col("sa").alias("a"), F.col("sb").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"]).persist()
    corners = (
        tri.select(F.col("a").alias("s_suppkey"))
        .unionAll(tri.select(F.col("b").alias("s_suppkey")))
        .unionAll(tri.select(F.col("c").alias("s_suppkey")))
    )
    return corners.groupBy("s_suppkey").agg(F.count(F.lit(1)).alias("n_triangles"))


def old_label_propagation_communities(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct().persist()
    ok = (
        ps.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= _LPA_HOT_PART))
        .select("l_partkey")
    )
    a = ps.select("l_partkey", F.col("l_suppkey").alias("sa")).join(ok, "l_partkey")
    und = (
        a.join(ps.select("l_partkey", F.col("l_suppkey").alias("sb")), "l_partkey")
        .filter(F.col("sa") < F.col("sb"))
        .select("sa", "sb")
        .distinct()
    )
    edges = (
        und.select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
        .unionAll(und.select(F.col("sb").alias("src"), F.col("sa").alias("dst")))
        .persist()
    )
    lbl = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        votes = (
            edges.join(lbl.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        lbl = (
            votes.groupBy("node")
            .agg(
                F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("_neg"))).alias("_m")
            )
            .select("node", (-F.col("_m._neg")).alias("label"))
        )
    return lbl.select(F.col("node").alias("s_suppkey"), F.col("label").alias("community"))


OLD = {
    "ngram_novelty_score": old_ngram_novelty_score,
    "market_basket_rules": old_market_basket_rules,
    "supplier_triangles": old_supplier_triangles,
    "label_propagation_communities": old_label_propagation_communities,
}


def old_tfidf_cosine_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    threshold, df_cap = 0.04, 64
    toks = docs.select(
        F.col("doc_id"), F.col("source").alias("blk"), tokens_col("text").alias("_t")
    )
    idx = F.when(
        F.size("_t") >= 3, F.sequence(F.lit(1), F.size("_t") - 2)
    ).otherwise(F.array().cast("array<int>"))
    gram = F.concat_ws(" ", F.slice(F.col("_t"), F.col("i"), 3))
    ex = toks.select(
        "doc_id", "blk", F.explode(idx).alias("i"), "_t"
    ).select("doc_id", "blk", gram.alias("g"))
    tf = ex.groupBy("doc_id", "blk", "g").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf_n9 = F.round(
        F.round(F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 9) * 1e9
    ).cast("long")
    w = (
        tf.join(dft, "g")
        .filter(F.col("df") <= df_cap)
        .crossJoin(F.broadcast(n))
        .select("doc_id", "blk", "g", "df", (F.col("tf") * idf_n9).alias("wn"))
        .persist()
    )
    wd = F.col("wn").cast("decimal(19,0)")
    nrm = w.groupBy("doc_id").agg(F.sqrt(F.sum(wd * wd).cast("double")).alias("nrm"))
    shared = w.filter(F.col("df") >= 2)
    a = shared.select(F.col("doc_id").alias("id_a"), "blk", "g", F.col("wn").alias("wa"))
    b = shared.select(F.col("doc_id").alias("id_b"), "blk", "g", F.col("wn").alias("wb"))
    dot = (
        a.join(b, ["blk", "g"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.col("wa").cast("decimal(19,0)") * F.col("wb").cast("decimal(19,0)"))
            .cast("double")
            .alias("dot")
        )
    )
    na = nrm.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb"))
    den = F.col("na") * F.col("nb")
    cos = F.when(den > 0, F.round(F.col("dot") / den, 6))
    return (
        dot.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def old_exact_substr_scrub(spark, sf_dir, n=8):
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.col("doc_id"), tokens_col("text").alias("toks"))
    pos_tok = toks.select(
        "doc_id", F.posexplode("toks").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    g = toks.filter(F.size("toks") >= n).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                lambda i: F.struct(
                    i.alias("i"), F.concat_ws(" ", F.slice("toks", i, n)).alias("g")
                ),
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.i").alias("i"), F.col("s.g").alias("g"))
    g = g.persist()
    dup = (
        g.groupBy("g")
        .agg(F.min("doc_id").alias("mind"), F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g", "mind")
    )
    cov = (
        g.join(dup, "g")
        .filter(F.col("doc_id") > F.col("mind"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + (n - 1))).alias("pos"),
        )
        .distinct()
    )
    kept = pos_tok.join(cov, ["doc_id", "pos"], "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("ct"),
    )
    return (
        toks.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
            F.md5(F.coalesce(F.col("ct"), F.lit(""))).alias("clean_md5"),
        )
    )


def _old_truth_pairs(sh_raw):
    st = sh_raw.select(
        "doc_id", F.size("sh").alias("sz"), F.explode("sh").alias("shingle")
    )
    x = st.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sa"), "shingle")
    y = st.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sb"), "shingle")
    tr = (
        x.join(y, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sa", "sb")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    return tr.select(
        "id_a",
        "id_b",
        (F.col("i").cast("double") / (F.col("sa") + F.col("sb") - F.col("i"))).alias("j"),
    )


def old_neardup_eval_metrics(spark, sf_dir):
    from convex_batch_processor_spark.llmops import dedup as D

    _TAU = 0.5
    docs = _t(spark, sf_dir, "documents")
    cands, sh_raw = D.minhash_md5_candidates(docs)
    truth = _old_truth_pairs(sh_raw).filter(F.col("j") >= _TAU)
    pairs = truth.select(
        "id_a", "id_b", F.lit(1).alias("_t"), F.lit(0).alias("_c")
    ).unionAll(
        cands.select("id_a", "id_b", F.lit(0).alias("_t"), F.lit(1).alias("_c"))
    )
    per_pair = pairs.groupBy("id_a", "id_b").agg(
        F.max("_t").alias("_t"), F.max("_c").alias("_c")
    )
    m = per_pair.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("n_truth"),
        F.coalesce(F.sum(F.col("_t") * F.col("_c")), F.lit(0)).cast("long").alias("tp"),
    )
    return m.select(
        "n_candidates",
        "n_truth",
        "tp",
        (F.col("n_candidates") - F.col("tp")).alias("fp"),
        (F.col("n_truth") - F.col("tp")).alias("fn"),
        F.when(F.col("n_candidates") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("tp").cast("double") / F.col("n_candidates"))
        .alias("lsh_precision"),
        F.when(F.col("n_truth") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("tp").cast("double") / F.col("n_truth"))
        .alias("lsh_recall"),
    )


OLD["tfidf_cosine_pairs"] = old_tfidf_cosine_pairs
OLD["exact_substr_scrub"] = old_exact_substr_scrub
OLD["neardup_eval_metrics"] = old_neardup_eval_metrics


def _old_l2_assign(embeddings, centroids, id_col, vec_col):
    cents = centroids.groupBy().agg(
        F.collect_list(F.struct("cluster_id", "centroid")).alias("_cents")
    )
    dist2 = lambda c: F.aggregate(  # noqa: E731
        F.zip_with(
            F.col(vec_col),
            c["centroid"],
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    best = F.array_min(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(dist2(c).alias("dist2"), c["cluster_id"].alias("cluster_id")),
        )
    )
    return (
        embeddings.select(id_col, vec_col)
        .join(F.broadcast(cents))
        .withColumn("_best", best)
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("_best.cluster_id").alias("cluster_id"),
            F.col("_best.dist2").alias("dist2"),
        )
    )


def _old_kmeans_fit(embeddings, k, n_iter, id_col, vec_col, round_dp):
    spark = embeddings.sparkSession
    schema = "cluster_id long, centroid array<double>"
    data = embeddings.select(id_col, vec_col).filter(F.col(vec_col).isNotNull()).persist()
    try:
        init = data.orderBy(F.col(id_col).asc()).limit(k).collect()
        cent_rows = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(init)]
        for _ in range(n_iter):
            centroids = spark.createDataFrame(cent_rows, schema)
            assign = _old_l2_assign(data, centroids, id_col, vec_col)
            m_expr = F.avg(F.col("val").cast("double"))
            if round_dp is not None:
                m_expr = F.round(m_expr, round_dp)
            dm = (
                assign.select("cluster_id", F.posexplode(F.col(vec_col)).alias("dim", "val"))
                .groupBy("cluster_id", "dim")
                .agg(m_expr.alias("m"))
                .collect()
            )
            by_cluster = {}
            for r in dm:
                by_cluster.setdefault(r["cluster_id"], {})[r["dim"]] = r["m"]
            cent_rows = [
                (
                    cid,
                    [by_cluster[cid][d] for d in range(len(prev))]
                    if cid in by_cluster
                    else prev,
                )
                for cid, prev in cent_rows
            ]
    finally:
        data.unpersist()
    return spark.createDataFrame(cent_rows, schema)


def old_kmeans_clusters(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    centroids = _old_kmeans_fit(emb, 8, 4, "vec_id", "embedding", 6)
    out = _old_l2_assign(emb, centroids, "vec_id", "embedding")
    return out.select(
        F.col("vec_id"), "cluster_id", F.round("dist2", 6).alias("dist2")
    )


OLD["kmeans_clusters"] = old_kmeans_clusters


def new_eval_with_distinct(spark, sf_dir):
    # r13 interim arm: identical to neardup_eval_metrics but with the
    # candidate .distinct() retained (distinct_pairs=True)
    from convex_batch_processor_spark.llmops import dedup as D
    import convex_batch_processor_spark.queries.llm50 as q

    _TAU = 0.5
    docs = _t(spark, sf_dir, "documents")
    cands, sh_raw = D.minhash_md5_candidates(docs, distinct_pairs=True)
    truth = q._truth_pairs(sh_raw).filter(F.col("j") >= _TAU)
    pairs = truth.select(
        "id_a", "id_b", F.lit(1).alias("_t"), F.lit(0).alias("_c")
    ).unionAll(
        cands.select("id_a", "id_b", F.lit(0).alias("_t"), F.lit(1).alias("_c"))
    )
    per_pair = pairs.groupBy("id_a", "id_b").agg(
        F.max("_t").alias("_t"), F.max("_c").alias("_c")
    )
    m = per_pair.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("n_truth"),
        F.coalesce(F.sum(F.col("_t") * F.col("_c")), F.lit(0)).cast("long").alias("tp"),
    )
    return m.select(
        "n_candidates", "n_truth", "tp",
        (F.col("n_candidates") - F.col("tp")).alias("fp"),
        (F.col("n_truth") - F.col("tp")).alias("fn"),
        F.when(F.col("n_candidates") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("tp").cast("double") / F.col("n_candidates"))
        .alias("lsh_precision"),
        F.when(F.col("n_truth") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("tp").cast("double") / F.col("n_truth"))
        .alias("lsh_recall"),
    )


OLD["neardup_eval_metrics"] = new_eval_with_distinct


def _old_connected_components(edges, src="src", dst="dst", max_iter=25):
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    und = und.localCheckpoint(eager=True)
    labels = (
        und.select(F.col("a").alias("node")).distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh_min = (
            und.join(labels, und.b == labels.node)
            .groupBy("a")
            .agg(F.min("comp").alias("neigh_comp"))
        )
        stepped = (
            labels.join(neigh_min, labels.node == neigh_min.a, "left")
            .select(
                "node",
                F.col("comp").alias("_prev"),
                F.least(F.col("comp"), F.coalesce("neigh_comp", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = stepped.filter(F.col("comp") != F.col("_prev")).limit(1).count()
        labels = stepped.select("node", "comp")
        if changed == 0:
            return labels.select("node", F.col("comp").alias("component_id"))
    raise RuntimeError("no converge")


def old_dedup_keep_best(spark, sf_dir):
    from convex_batch_processor_spark.queries.llm import _neardup_edges, X
    docs = _t(spark, sf_dir, "documents")
    comp = _old_connected_components(_neardup_edges(spark, sf_dir), "id_a", "id_b")
    scored = (
        docs.join(F.broadcast(comp), docs.doc_id == comp.node)
        .select("component_id", "doc_id", X.token_count().alias("n_tokens"))
    )
    return (
        scored.groupBy("component_id")
        .agg(
            F.max(
                F.struct(F.col("n_tokens"), (-F.col("doc_id")).alias("_negid"))
            ).alias("_best"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "component_id",
            (-F.col("_best._negid")).alias("keep_doc_id"),
            F.col("_best.n_tokens").alias("keep_n_tokens"),
            "n_members",
        )
    )


def old_bloom_decontamination_prefilter(spark, sf_dir):
    from convex_batch_processor_spark.llmops import sketches as K
    from convex_batch_processor_spark.llmops.dedup import exploded_shingles
    _BLOOM_M, _BLOOM_K, _BLOOM_N = 65536, 3, 8
    grams = exploded_shingles(_t(spark, sf_dir, "documents"), n=_BLOOM_N, out="gram")
    eval_grams = (
        grams.filter(F.col("doc_id") % 50 == 0).select("gram").distinct().persist()
    )
    corpus = grams.filter(F.col("doc_id") % 50 != 0)
    words = [0] * ((_BLOOM_M + 31) // 32)
    for r in K.bloom_bits(eval_grams, "gram", _BLOOM_M, _BLOOM_K).collect():
        words[r.pos // 32] |= 1 << (r.pos % 32)
    return (
        corpus.withColumn(
            "bloom_hit", K.bloom_hit_col("gram", words, _BLOOM_M, _BLOOM_K)
        )
        .join(
            F.broadcast(eval_grams.withColumn("in_eval", F.lit(1))), "gram", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.col("bloom_hit").cast("long")).alias("n_bloom_hits"),
            F.sum(F.coalesce(F.col("in_eval"), F.lit(0)).cast("long")).alias("n_true_hits"),
        )
        .filter(F.col("n_bloom_hits") > 0)
        .select("doc_id", "n_grams", "n_bloom_hits", "n_true_hits")
    )


OLD["dedup_keep_best"] = old_dedup_keep_best
OLD["bloom_decontamination_prefilter"] = old_bloom_decontamination_prefilter


def old_cosine_neardup_bucketed(spark, sf_dir):
    # r12 shape: JVM interpreted dot fold in the rerank
    from convex_batch_processor_spark.llmops.similarity import (
        banded_lsh_signatures, dot_col,
    )
    embeddings = _t(spark, sf_dir, "embeddings")
    threshold, id_col, vec_col = 0.42, "vec_id", "embedding"
    sig = banded_lsh_signatures(embeddings, 24, 4, 64, 42, id_col, vec_col).persist()
    a = sig.select(F.col(id_col).alias("vec_id_a"), "band", "bucket")
    b = sig.select(F.col(id_col).alias("vec_id_b"), "band", "bucket")
    _p = embeddings.sparkSession.sparkContext.defaultParallelism
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b")
        .repartition(_p, "vec_id_a", "vec_id_b")
        .dropDuplicates(["vec_id_a", "vec_id_b"])
    )
    norm = embeddings.withColumn("_n", F.sqrt(dot_col(F.col(vec_col), F.col(vec_col))))
    unit = norm.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col), lambda x: F.when(F.col("_n") > 0, x / F.col("_n")).otherwise(F.lit(0.0))
        ).alias("unit"),
    )
    va = unit.select(F.col(id_col).alias("vec_id_a"), F.col("unit").alias("ua"))
    vb = unit.select(F.col(id_col).alias("vec_id_b"), F.col("unit").alias("ub"))
    sim = F.round(dot_col(F.col("ua"), F.col("ub")), 6)
    return (
        cand.join(va, "vec_id_a")
        .join(vb, "vec_id_b")
        .select("vec_id_a", "vec_id_b", sim.alias("sim"))
        .filter(F.col("sim") > threshold)
    )


def old_cosine_lsh_portable(spark, sf_dir):
    from convex_batch_processor_spark.llmops.similarity import (
        hyperplane_lsh_buckets, dot_col,
    )
    embeddings = _t(spark, sf_dir, "embeddings")
    threshold, id_col, vec_col = 0.42, "vec_id", "embedding"
    n_bands, bits_per_band, dim, seed = 4, 4, 64, 42
    sigs = []
    for band in range(n_bands):
        s = hyperplane_lsh_buckets(
            embeddings, n_bits=bits_per_band, dim=dim, seed=seed + band,
            id_col=id_col, vec_col=vec_col,
        ).select(F.col(id_col), F.lit(band).alias("band"), "bucket")
        sigs.append(s)
    sig = sigs[0]
    for s in sigs[1:]:
        sig = sig.unionAll(s)
    sig = sig.persist()
    a = sig.select(F.col(id_col).alias("vec_id_a"), "band", "bucket")
    b = sig.select(F.col(id_col).alias("vec_id_b"), "band", "bucket")
    _p = embeddings.sparkSession.sparkContext.defaultParallelism
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b")
        .repartition(_p, "vec_id_a", "vec_id_b")
        .dropDuplicates(["vec_id_a", "vec_id_b"])
    )
    nv = embeddings.withColumn("_n", F.sqrt(dot_col(F.col(vec_col), F.col(vec_col))))
    ea = nv.select(
        F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("va"), F.col("_n").alias("na")
    )
    eb = nv.select(
        F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("vb"), F.col("_n").alias("nb")
    )
    den = F.col("na") * F.col("nb")
    sim = F.round(F.when(den > 0, dot_col(F.col("va"), F.col("vb")) / den), 6)
    return (
        cand.join(ea, "vec_id_a")
        .join(eb, "vec_id_b")
        .select("vec_id_a", "vec_id_b", sim.alias("sim"))
        .filter(F.col("sim") > threshold)
    )


def old_training_pipeline_v2(spark, sf_dir):
    # r12 shape: bigram_logprob_scores WITHOUT the `big` persist
    from pyspark.sql import Window
    from convex_batch_processor_spark.llmops.retrieval import ngram_contamination
    from convex_batch_processor_spark.queries.llm import X

    docs = _t(spark, sf_dir, "documents")
    id_col, text_col = "doc_id", "text"
    toks = docs.select(F.col(id_col), tokens_col(text_col).alias("t"))
    big = toks.filter(F.size("t") >= 2).select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda a, b: F.struct(a.alias("w1"), F.concat_ws(" ", a, b).alias("bg")),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))
    c12 = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.select(F.explode("t").alias("w")).agg(F.countDistinct("w").alias("v"))
    scored = (
        big.join(c12, "bg")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.round(F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v"))), 9).alias("lp"),
        )
    )
    lm = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum(F.col("lp").cast("decimal(18,9)")).cast("double") / F.count(F.lit(1))).alias("avg_logp"),
    )
    scores = (
        docs.filter(F.col("source") != "src0")
        .select("doc_id")
        .join(lm.select("doc_id", "avg_logp"), "doc_id")
    )
    ranked = scores.withColumn(
        "rn", F.row_number().over(Window.orderBy("avg_logp", "doc_id"))
    ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy()))
    keep = ranked.filter(F.col("rn") > F.floor(F.lit(0.1) * F.col("n"))).select(
        "doc_id", "avg_logp"
    )
    quality = (
        docs.filter(F.col("source") != "src0")
        .select("doc_id", "source", "text")
        .join(keep, "doc_id")
        .select("doc_id", "source", "text", "avg_logp")
    )
    contam_ids = ngram_contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=8,
    ).select("doc_id")
    clean = quality.join(contam_ids, "doc_id", "left_anti")
    deduped = (
        clean.withColumn(
            "rd",
            F.row_number().over(Window.partitionBy(F.md5("text")).orderBy("doc_id")),
        )
        .filter(F.col("rd") == 1)
    )
    sized = deduped.select(
        "source", "doc_id", X.token_count().alias("n_tokens"), "avg_logp"
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w_cum)
    return sized.select(
        "source",
        "doc_id",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / 512).alias("bin_id"),
        "avg_logp",
    )


OLD["cosine_neardup_bucketed"] = old_cosine_neardup_bucketed
OLD["cosine_lsh_portable_neardup"] = old_cosine_lsh_portable
OLD["training_pipeline_v2"] = old_training_pipeline_v2


def new_eval_prematerialized(spark, sf_dir):
    # r13 candidate arm: identical to neardup_eval_metrics but sh_raw is
    # force-materialized before the union job, so the two independent
    # branch stages cannot both compute the cold shingle pipeline
    from convex_batch_processor_spark.llmops import dedup as D
    import convex_batch_processor_spark.queries.llm50 as q

    _TAU = 0.5
    docs = _t(spark, sf_dir, "documents")
    cands, sh_raw = D.minhash_md5_candidates(docs)
    sh_raw.count()
    truth = q._truth_pairs(sh_raw).filter(F.col("j") >= _TAU)
    pairs = truth.select(
        "id_a", "id_b", F.lit(1).alias("_t"), F.lit(0).alias("_c")
    ).unionAll(
        cands.select("id_a", "id_b", F.lit(0).alias("_t"), F.lit(1).alias("_c"))
    )
    per_pair = pairs.groupBy("id_a", "id_b").agg(
        F.max("_t").alias("_t"), F.max("_c").alias("_c")
    )
    m = per_pair.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("n_truth"),
        F.coalesce(F.sum(F.col("_t") * F.col("_c")), F.lit(0)).cast("long").alias("tp"),
    )
    return m.select(
        "n_candidates", "n_truth", "tp",
        (F.col("n_candidates") - F.col("tp")).alias("fp"),
        (F.col("n_truth") - F.col("tp")).alias("fn"),
        F.when(F.col("n_candidates") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("tp").cast("double") / F.col("n_candidates"))
        .alias("lsh_precision"),
        F.when(F.col("n_truth") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("tp").cast("double") / F.col("n_truth"))
        .alias("lsh_recall"),
    )


OLD["neardup_eval_metrics"] = new_eval_prematerialized
