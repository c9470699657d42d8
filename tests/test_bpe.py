"""Distributed BPE trainer == local reference implementation;
apply-path invariants."""

from __future__ import annotations

from collections import Counter


def _local_bpe(word_freqs: dict[str, int], n_merges: int, min_count: int = 2):
    """Plain-python Sennrich trainer with the same deterministic
    tie-break (max count, then lexicographic (a, b))."""
    words = {w: list(w) + ["</w>"] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, syms in words.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


CORPUS = [
    "hug " * 10, "pug " * 5, "pun " * 12, "bun " * 4, "hugs " * 5,
    "the quick brown fox jumps over the lazy dog",
    "the the the thorn then there",
]


def test_train_matches_local_reference(spark):
    from model_presto_spark.operators.bpe import train_bpe_merges

    rows = [(i, t) for i, t in enumerate(CORPUS)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = train_bpe_merges(df, n_merges=12)

    wf = Counter()
    for t in CORPUS:
        for w in t.lower().split():
            wf[w] += 1
    want = _local_bpe(dict(wf), 12)
    assert got == want and len(got) == 12


def test_apply_bpe_invariants(spark):
    from model_presto_spark.operators.bpe import apply_bpe, train_bpe_merges

    rows = [(i, t) for i, t in enumerate(CORPUS)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    merges = train_bpe_merges(df, n_merges=12)
    out = {r.doc_id: r for r in apply_bpe(df, "doc_id", "text", merges).collect()}
    for i, text in enumerate(CORPUS):
        words = text.lower().split()
        toks = list(out[i].tokens)
        # tokens re-concatenate to the original words (</w> marks ends)
        rebuilt = "".join(toks).replace("</w>", " ").split()
        assert rebuilt == words
        assert out[i].n_tokens == len(toks)
    # high-frequency 'hug' compresses into few symbols
    hug_doc = out[0]
    assert hug_doc.n_tokens <= 2 * 10  # <= 2 tokens per 'hug'
