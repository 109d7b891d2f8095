"""Retrieval (BM25, decontamination), sequence packing, and IVF search —
python-oracle and invariant tests."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from convex_batch_processor_spark.catalog import load_table
from convex_batch_processor_spark.llmops import packing as P
from convex_batch_processor_spark.llmops import retrieval as R
from convex_batch_processor_spark.llmops import similarity as S


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_bm25_matches_python_reference(spark, sf_dir):
    terms = ["spark", "window", "hash"]
    rows = _docs(spark, sf_dir).select("doc_id", "text").collect()
    toks = {r.doc_id: [t for t in r.text.split(" ") if t] for r in rows}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {t: sum(1 for d in toks.values() if t in d) for t in terms}
    idf = {t: round(math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0), 9) for t in terms}

    def score(d):
        s = 0.0
        for t in terms:
            tf = toks[d].count(t)
            if tf:
                s += idf[t] * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(toks[d]) / avgdl))
        return round(s, 6)

    expected = sorted(((score(d), d) for d in toks), key=lambda x: (-x[0], x[1]))[:20]
    got = [(r.score, r.doc_id) for r in R.bm25_topk(_docs(spark, sf_dir), terms, k=20).collect()]
    assert got == expected


def test_contamination_blocks_on_gram_no_self_matches(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("source") != "src0")
    evalset = docs.filter(F.col("source") == "src0")
    out = R.ngram_contamination(train, evalset, n=8).collect()
    train_ids = {r.doc_id for r in train.select("doc_id").collect()}
    eval_ids = {r.doc_id for r in evalset.select("doc_id").collect()}
    for r in out:
        assert r.doc_id in train_ids and r.doc_id not in eval_ids
        assert r.n_eval_docs >= 1 and r.n_shared_grams >= 1
    # tighter n (longer grams) can only shrink the contaminated set
    out12 = R.ngram_contamination(train, evalset, n=12).collect()
    assert {r.doc_id for r in out12} <= {r.doc_id for r in out}


def _greedy_oracle(rows, cap):
    """first-fit packing per source, doc_id order → {doc_id: bin_id}"""
    by_src: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.source, r.doc_id)):
        by_src.setdefault(r.source, []).append(r)
    out = {}
    for src, docs in by_src.items():
        bin_id, fill = 0, 0
        for r in docs:
            if fill > 0 and fill + r.n_tokens > cap:
                bin_id, fill = bin_id + 1, 0
            out[r.doc_id] = bin_id
            fill += r.n_tokens
    return out


def test_pack_greedy_matches_python_oracle_and_respects_capacity(spark, sf_dir):
    cap = 64  # small capacity → many bins, boundary cases exercised
    got = P.pack_greedy(_docs(spark, sf_dir), capacity=cap).collect()
    assert _greedy_oracle(got, cap) == {r.doc_id: r.bin_id for r in got}
    fills: dict[tuple, int] = {}
    counts: dict[tuple, int] = {}
    for r in got:
        key = (r.source, r.bin_id)
        fills[key] = fills.get(key, 0) + r.n_tokens
        counts[key] = counts.get(key, 0) + 1
    for key, total in fills.items():
        assert total <= cap or counts[key] == 1, f"overfull multi-doc bin {key}"


def test_pack_handles_null_text_as_zero_tokens(spark):
    """A NULL text (failed fetch, tombstoned row) must pack as a 0-token
    doc, not NaN-poison the greedy fold or kill the Arrow batch on the
    int schema."""
    rows = [
        ("web", 1, "a b c"),
        ("web", 2, None),
        ("web", 3, "d e"),
        ("book", 4, None),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    greedy = {r.doc_id: r for r in P.pack_greedy(df, capacity=4).collect()}
    chunks = {r.doc_id: r for r in P.pack_chunks(df, capacity=4).collect()}
    assert len(greedy) == len(chunks) == 4
    for got in (greedy, chunks):
        assert got[2].n_tokens == 0 and got[4].n_tokens == 0
        # 0-token docs never close a bin: doc 2 rides doc 1's bin
        assert got[2].bin_id == got[1].bin_id
        assert got[4].bin_id == 0


def test_pack_chunks_bins_are_contiguous_cumsum(spark, sf_dir):
    cap = 512
    got = P.pack_chunks(_docs(spark, sf_dir), capacity=cap).collect()
    by_src: dict[str, list] = {}
    for r in sorted(got, key=lambda r: (r.source, r.doc_id)):
        by_src.setdefault(r.source, []).append(r)
    for docs in by_src.values():
        cum = 0
        for r in docs:
            assert r.bin_id == cum // cap
            cum += r.n_tokens


def test_semantic_dedup_invariants_and_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.semantic_dedup(emb, threshold=0.42).collect()
    n = emb.count()
    # every vector labeled exactly once
    assert len(out) == n and len({r.vec_id for r in out}) == n
    # exactly one keeper per component, and it is the min id
    by_comp: dict[int, list] = {}
    for r in out:
        by_comp.setdefault(r.component_id, []).append(r)
    for comp_id, members in by_comp.items():
        assert comp_id == min(m.vec_id for m in members)
        keeps = [m.vec_id for m in members if m.keep]
        assert keeps == [comp_id]
    # exact near-dup pairs end up co-component (LSH recall; transitive
    # closure can only merge further, never split)
    exact = S.cosine_neardup_pairs(emb, 0.42).collect()
    comp_of = {r.vec_id: r.component_id for r in out}
    co = sum(1 for r in exact if comp_of[r.vec_id_a] == comp_of[r.vec_id_b])
    assert exact and co / len(exact) >= 0.9, f"co-membership recall {co}/{len(exact)}"


def _bpe_reference(word_freqs, n_merges):
    """Classic BPE (greedy left-to-right merge, count-desc/lexicographic
    tiebreak), pure python."""
    words = [(list(w), f) for w, f in word_freqs.items()]
    rules = []
    for rank in range(n_merges):
        counts: dict[tuple, int] = {}
        for syms, f in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), cnt = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        rules.append((rank, l, r, l + r, cnt))
        new_words = []
        for syms, f in words:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((out, f))
        words = new_words
    return rules


def test_bpe_merges_match_python_reference(spark, sf_dir):
    from collections import Counter

    from convex_batch_processor_spark.llmops.bpe import bpe_train_merges

    docs = _docs(spark, sf_dir)
    freqs = Counter(
        w for r in docs.select("text").collect() for w in r.text.split(" ") if w
    )
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in bpe_train_merges(docs, n_merges=8).collect()
    ]
    assert got == _bpe_reference(freqs, 8)


def test_bpe_overlapping_pairs_greedy_left_to_right(spark):
    from convex_batch_processor_spark.llmops.bpe import bpe_train_merges

    df = spark.createDataFrame([(1, "aaaa aab")], "doc_id long, text string")
    rules = bpe_train_merges(df, n_merges=2).collect()
    # 'aaaa' has 3 overlapping (a,a) pairs + 'aab' has 1 → count 4;
    # greedy merge leaves aa,aa and aa,b → next best pair is (aa,aa)
    assert (rules[0].left, rules[0].right, rules[0].pair_count) == ("a", "a", 4)
    assert (rules[1].left, rules[1].right) == ("aa", "aa")


def test_bpe_local_and_distributed_modes_identical(spark, sf_dir):
    from convex_batch_processor_spark.llmops.bpe import bpe_train_merges

    docs = _docs(spark, sf_dir).limit(60)
    key = lambda df: [  # noqa: E731
        (r.rank, r.left, r.right, r.merged, r.pair_count) for r in df.collect()
    ]
    local = key(bpe_train_merges(docs, n_merges=6, mode="local"))
    dist = key(bpe_train_merges(docs, n_merges=6, mode="distributed"))
    assert local == dist and len(local) == 6


def test_bpe_min_freq_prunes_vocabulary(spark):
    from convex_batch_processor_spark.llmops.bpe import bpe_train_merges

    # "zq" appears once: with min_freq=2 its (z,q) pair must never train
    df = spark.createDataFrame(
        [(1, "abab abab zq"), (2, "abab")], "doc_id long, text string"
    )
    rules = bpe_train_merges(df, n_merges=3, min_freq=2).collect()
    assert all((r.left, r.right) != ("z", "q") for r in rules)
    assert (rules[0].left, rules[0].right) == ("a", "b")


def test_bpe_apply_matches_python_tokenization(spark, sf_dir):
    from collections import Counter

    from convex_batch_processor_spark.llmops.bpe import bpe_apply, bpe_train_merges

    docs = _docs(spark, sf_dir)
    rows = docs.select("doc_id", "text").collect()
    freqs = Counter(w for r in rows for w in r.text.split(" ") if w)
    ref_rules = _bpe_reference(freqs, 8)
    rules = [(l, r) for _, l, r, _, _ in ref_rules]

    def tokenize(word):
        syms = list(word)
        for l, r in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    expected = {
        r.doc_id: sum(tokenize(w) for w in r.text.split(" ") if w) for r in rows
    }
    got = {r.doc_id: r.n_bpe_tokens for r in bpe_apply(docs, rules).collect()}
    assert got == expected


def test_cdc_chunks_content_defined_shift_stability(spark):
    """The CDC property: inserting a token at the FRONT of a document
    only changes the first chunk — every chunk from the first boundary
    token on is identical, because boundaries depend on token content,
    not position. (md5('gamma')='05...' and md5('nu')='02...' are
    boundary tokens; the others are not.)"""
    base = "alpha beta gamma delta kappa nu omega"   # chunks: 2, 3, 2
    shifted = "sigma " + base                        # chunks: 3, 3, 2

    def chunks(text):
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(P.cdc_chunks(df).collect(), key=lambda r: r.chunk_idx)
        return [r.n_tokens for r in rows]

    assert chunks(base) == [2, 3, 2]
    assert chunks(shifted) == [3, 3, 2]  # tail chunks unchanged


def test_ivf_search_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = [0, 1, 2]
    exact = {(r.q_vec_id, r.vec_id) for r in S.knn_bruteforce(emb, queries, k=5).collect()}
    # probing ALL lists degenerates to exact search → recall 1.0
    full = S.ivf_search(emb, queries, k=5, nprobe=10)
    assert {(r.q_vec_id, r.vec_id) for r in full.collect()} == exact
    # 5 of 10 lists. The synthetic labels are weak coarse quantizers
    # (recall grows ~linearly in nprobe on this corpus), so the bound is
    # the honest one for this data, not the tight-cluster ideal.
    part = {(r.q_vec_id, r.vec_id) for r in S.ivf_search(emb, queries, k=5, nprobe=5).collect()}
    recall = len(exact & part) / len(exact)
    assert recall >= 0.6, f"IVF recall collapsed: {recall}"


def test_pack_greedy_nonstring_group_key(spark, sf_dir):
    """Review r6: the applyInPandas result schema hardcoded the group
    column as string and the id as long — a bigint group key failed
    Arrow serialization. Key types now come from the input schema."""
    from pyspark.sql import functions as F2

    from convex_batch_processor_spark.llmops.packing import pack_greedy

    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("src_num", F2.crc32("source").cast("bigint"))
        .limit(200)
    )
    out = pack_greedy(docs, capacity=256, group_col="src_num")
    assert dict(out.dtypes)["src_num"] == "bigint"
    assert out.count() == 200


def test_bpe_apply_accounts_empty_and_null_docs(spark):
    """Regression (r8 llmops review): NULL-text and token-free docs must
    emit (doc_id, 0, 0) instead of vanishing from the output — the
    package's row-accounting convention."""
    from convex_batch_processor_spark.llmops.bpe import bpe_apply

    docs = spark.createDataFrame(
        [(1, "aa ab aa"), (2, None), (3, "   "), (4, "ab")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.n_words, r.n_bpe_tokens)
            for r in bpe_apply(docs, [("a", "a"), ("a", "b")]).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2] == (0, 0)
    assert rows[3] == (0, 0)
    assert rows[1][0] == 3
    assert rows[4] == (1, 1)  # 'ab' merges to one token
