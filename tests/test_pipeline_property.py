"""Property-based tests for the pipeline operators (hypothesis): each
Spark operator is compared against an independent pure-Python reference
implementation on randomized corpora. One shared Spark session; hypothesis
drives the INPUT GENERATION, the per-example check is a driver-side
equality against the Python model.

Example counts are kept small (Spark jobs are ~0.5-2 s each); the value
is in the randomized SHAPES — empty docs, all-duplicate corpora, single
paragraphs, skewed strata — not in volume.
"""

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings, strategies as st

SETTINGS = dict(max_examples=12, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

WORDS = ["alpha", "beta", "gamma", "delta", "x", "yy", "zzz"]


@st.composite
def corpora(draw, max_docs=12, max_pars=4, max_words=6):
    docs = []
    n = draw(st.integers(1, max_docs))
    for i in range(n):
        pars = draw(st.lists(
            st.lists(st.sampled_from(WORDS), min_size=1,
                     max_size=max_words).map(" ".join),
            min_size=1, max_size=max_pars))
        docs.append((i, "\n\n".join(pars)))
    return docs


def _pd_reference(docs, sep="\n\n"):
    """Pure-Python paragraph dedup: global first occurrence by
    (doc_id, pos) wins; docs rebuilt from survivors."""
    seen = set()
    out = {}
    for doc_id, text in sorted(docs):
        kept = []
        removed = 0
        for par in text.split(sep):
            if par in seen:
                removed += 1
            else:
                seen.add(par)
                kept.append(par)
        out[doc_id] = (sep.join(kept), removed)
    return out


@given(corpora())
@settings(**SETTINGS)
def test_paragraph_dedup_matches_python_model(spark, docs):
    from tbl_spark.pipelines.dedup import paragraph_dedup
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["doc_id"]: (r["text"], r["n_pars_removed"])
           for r in paragraph_dedup(df).collect()}
    assert got == _pd_reference(docs)


@given(st.lists(st.integers(0, 400), min_size=1, max_size=40),
       st.sampled_from([1, 7, 256]))
@settings(**SETTINGS)
def test_pack_sequences_prefix_sum_property(spark, sizes, seq_len):
    from tbl_spark.pipelines.packing import pack_sequences
    rows = [(i, n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tok int")
    out = {r["doc_id"]: (r["start_offset"], r["seq_id"]) for r in
           pack_sequences(df, seq_len=seq_len, num_parts=5).collect()}
    acc = 0
    for i, n in enumerate(sizes):
        assert out[i] == (acc, acc // seq_len)
        acc += n


def _ngram_reference(text, top_n, dup_n):
    words = text.split()
    nch = max(len(text), 1)

    def grams(n):
        return [" ".join(words[i:i + n])
                for i in range(len(words) - n + 1)]

    from collections import Counter
    g = Counter(grams(top_n))
    if g:
        maxc = max(g.values())
        gram = min(w for w, c in g.items() if c == maxc)
        top = maxc * len(gram)
    else:
        top = 0
    d = Counter(grams(dup_n))
    dup = sum(c * len(w) for w, c in d.items() if c > 1)
    return round(top / nch, 6), round(dup / nch, 6)


@given(st.lists(st.sampled_from(WORDS), min_size=0, max_size=30),
       st.sampled_from([2, 3]), st.sampled_from([5, 6]))
@settings(**SETTINGS)
def test_ngram_repetition_matches_python_model(spark, words, tn, dn):
    from tbl_spark.pipelines.textstats import with_ngram_repetition
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    r = with_ngram_repetition(df, top_ns=(tn,), dup_ns=(dn,)).collect()[0]
    exp_top, exp_dup = _ngram_reference(text, tn, dn)
    assert r[f"frac_chars_top_{tn}gram"] == exp_top
    assert r[f"frac_chars_dup_{dn}grams"] == exp_dup


@given(st.lists(st.tuples(st.integers(0, 10_000),
                          st.sampled_from(["a", "b", "c", None])),
                min_size=1, max_size=60, unique_by=lambda t: t[0]),
       st.sampled_from([1.0, 2.0, 100.0]))
@settings(**SETTINGS)
def test_temperature_sample_rate_model(spark, rows, temp):
    """The kept set must equal the Python re-derivation of the rate
    formula + the md5-60 uniform for every (key, stratum)."""
    import hashlib
    from collections import Counter
    from tbl_spark.pipelines.sampling import temperature_sample
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    kept = {r["doc_id"] for r in
            temperature_sample(df, "source", "doc_id",
                               temperature=temp).collect()}
    counts = Counter(s for _, s in rows)
    p = {s: n ** (1.0 / temp) for s, n in counts.items()}
    tot = sum(p.values())
    w = {s: v / tot for s, v in p.items()}
    nstar = min(counts[s] / w[s] for s in counts)
    rate = {s: round(min(1.0, nstar * w[s] / counts[s]), 9)
            for s in counts}

    def u(key):
        return int(hashlib.md5(str(key).encode()).hexdigest()[:15],
                   16) / float(1 << 60)

    expect = {k for k, s in rows if u(k) < rate[s]}
    assert kept == expect
