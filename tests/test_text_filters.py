"""Ground-truth checks for the webtext admission / tokenizer-training ops:
the DuckDB oracle pins engine-vs-engine equality; these pin the MEANING —
bpe_merges reproduces a pure-Python reference BPE trainer, the Hamming
band join is exhaustive for distance <= 3 (Manku's guarantee), and the
C4/Gopher flags are internally consistent with their signal columns."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from webcrawler_spark.queries import (
    _QC_B,
    q_bpe_apply,
    q_pack_bins,
    q_quality_classifier,
    q_bpe_merges,
    q_c4_clean,
    q_gopher_rules,
    q_kmeans_embed,
    q_redirect_resolve,
    q_simhash,
    q_simhash_hamming_pairs,
    _read,
)

SF = "/root/testdata/sf0.001"


def _reference_bpe(word_freqs: dict[str, int], steps: int):
    """Sennrich et al. BPE: most-frequent adjacent pair, ties broken by
    the joined 'left|right' string ascending, merged left-to-right
    non-overlapping."""
    seqs = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for step in range(1, steps + 1):
        counts: Counter = Counter()
        for syms, f in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]}|{kv[0][1]}"))
        (a, b), c = best
        merges.append((step, f"{a}|{b}", a + b, c))
        new_seqs: dict[tuple, int] = {}
        for syms, f in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_seqs[key] = new_seqs.get(key, 0) + f
        seqs = new_seqs
    return merges


def test_bpe_merges_match_reference(spark):
    texts = [
        r.text for r in _read(spark, SF, "documents").select("text").collect()
    ]
    freqs: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                freqs[w] += 1
    expected = _reference_bpe(freqs, 8)
    got = [
        (r.step, r.pair, r.merged, r.cnt)
        for r in q_bpe_merges(spark, SF).orderBy("step").collect()
    ]
    assert got == expected


def test_simhash_hamming_pairs_exhaustive(spark):
    sims = {r.doc_id: r.simhash for r in q_simhash(spark, SF).collect()}
    ids = sorted(sims)
    brute = {
        (a, b, bin(sims[a] ^ sims[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sims[a] ^ sims[b]).count("1") <= 3
    }
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in q_simhash_hamming_pairs(spark, SF).collect()
    }
    # 4 bands over 32 bits: any pair at distance <= 3 shares a band, so
    # the band join is EXHAUSTIVE, not approximate, at this threshold
    assert got == brute
    assert len(got) > 0


def test_c4_clean_flags_consistent(spark):
    rows = q_c4_clean(spark, SF).collect()
    assert rows
    poisoned = dropped_short = 0
    for r in rows:
        assert 0 <= r.n_kept <= r.n_lines
        # every surviving line ends with the terminal '.', never javascript
        if r.cleaned_text:
            assert "javascript" not in r.cleaned_text
            assert r.cleaned_text.endswith(".")
        if r.doc_id % 17 == 0 or r.doc_id % 19 == 0:
            assert r.doc_kept == 0  # '{' / lorem-ipsum poison drops the doc
            poisoned += 1
        if r.doc_kept == 0 and r.n_kept < 3:
            dropped_short += 1
    assert poisoned > 0
    # both drop rules fire somewhere in the corpus
    assert any(r.doc_kept == 1 for r in rows)


def test_bpe_apply_counts(spark):
    """Segmenting with 8 merges can only shorten the all-character
    segmentation, never below one subword per word."""
    docs = {
        r.doc_id: [w for w in r.text.lower().split() if w]
        for r in _read(spark, SF, "documents").select("doc_id", "text").collect()
    }
    rows = {r.doc_id: r for r in q_bpe_apply(spark, SF).collect()}
    assert set(rows) == {d for d, ws in docs.items() if ws}
    for doc_id, r in rows.items():
        ws = docs[doc_id]
        n_chars = sum(len(w) for w in ws)
        assert r.n_words == len(ws)
        assert len(ws) <= r.n_subwords <= n_chars
    # the merges must actually compress somewhere
    assert any(
        r.n_subwords < sum(len(w) for w in docs[d]) for d, r in rows.items()
    )


def test_redirect_resolve_walks_to_terminal(spark):
    rows = {r.src: (r.final_dst, r.hops) for r in q_redirect_resolve(spark, SF).collect()}
    n_docs = _read(spark, SF, "documents").count()
    redirects = {
        d: d // 2 for d in range(1, n_docs) if d % 3 != 0
    }
    assert set(rows) == set(redirects)
    for src, (final, hops) in rows.items():
        # walk the chain in pure Python
        cur, n = src, 0
        while cur in redirects:
            cur = redirects[cur]
            n += 1
        assert (final, hops) == (cur, n), src
    assert max(h for _, h in rows.values()) >= 3  # real chains, not 1 hop


def test_kmeans_covers_all_vectors(spark):
    n_vecs = _read(spark, SF, "embeddings").count()
    rows = q_kmeans_embed(spark, SF).collect()
    assert 1 <= len(rows) <= 8
    assert sum(r.n_vectors for r in rows) == n_vecs
    for r in rows:
        assert r.inertia >= 0.0
        assert len(r.centroid) > 0


def test_pack_bins_is_contiguous_stream(spark):
    """The two-phase distributed cumsum must produce the exact
    concat-then-split layout: doc start offsets tile the token stream
    with no gaps or overlaps, in hash order."""
    rows = q_pack_bins(spark, SF).collect()
    total = sum(r.n_toks for r in rows)
    by_start = sorted(rows, key=lambda r: r.start_offset)
    expect = 0
    for r in by_start:
        assert r.start_offset == expect
        assert r.bin == r.start_offset // 2048
        assert r.offset_in_bin == r.start_offset % 2048
        expect += r.n_toks
    assert expect == total


def test_quality_classifier_separates(spark):
    """The integer-exact trained weights must classify the corpus well
    above the 'spark'-label base rate."""
    w = {r.b: r.w_micro for r in q_quality_classifier(spark, SF).collect()}
    docs = _read(spark, SF, "documents").select("doc_id", "text").collect()
    import hashlib

    def bucket(term):
        return int(hashlib.md5(term.encode()).hexdigest()[:4], 16) % _QC_B

    n = correct = pos = 0
    for r in docs:
        toks = [t for t in r.text.lower().split() if t]
        if not toks:
            continue
        y = 1 if "spark" in toks else 0
        s = sum(w.get(b, 0) for b in {bucket(t) for t in toks})
        pred = 1 if s >= 0 else 0
        n += 1
        pos += y
        correct += int(pred == y)
    base = max(pos, n - pos) / n
    assert correct / n > max(0.95, base + 0.01), (correct / n, base)


def test_gopher_rules_conjunction(spark):
    rows = q_gopher_rules(spark, SF).collect()
    assert rows
    for r in rows:
        flags = (r.ok_count, r.ok_length, r.ok_symbols, r.ok_alpha, r.ok_stop)
        assert r.keep == int(all(f == 1 for f in flags))
        if r.doc_id % 5 == 0:
            assert r.symbol_ratio > 0.0  # injection reached the signal
        if r.doc_id % 6 == 0:
            assert r.alpha_frac < 1.0
    # the rule set must actually discriminate on this corpus
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)


# ------------------------------------------------------------------ soft404_detect


def test_soft404_planted_recovery(spark):
    """The detector recovers EXACTLY the planted error-body docs: every
    doc_id % _S404_MOD == 0 flags with all three signal families, every
    real doc has zero signals (the 2-signal threshold means one stray
    token can never misroute a page)."""
    from webcrawler_spark.queries import _S404_MOD, q_soft404_detect

    rows = q_soft404_detect(spark, SF).collect()
    assert rows
    for r in rows:
        planted = r.doc_id % _S404_MOD == 0
        assert r.is_soft404 == int(planted), r
        if planted:
            assert r.hits_code >= 1 and r.hits_notfound >= 2 and r.hits_phrase >= 1
            assert r.sig_cnt == 3
        else:
            assert r.sig_cnt == 0
            assert (r.hits_code, r.hits_notfound, r.hits_phrase) == (0, 0, 0)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n_docs
