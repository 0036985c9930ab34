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

    def r6(x):
        # Spark's F.round is HALF_UP; Python's round() is half-even and
        # diverges whenever the value ties at the 6th decimal
        from decimal import ROUND_HALF_UP, Decimal
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                               rounding=ROUND_HALF_UP))

    return r6(top / nch), r6(dup / nch)


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


def _excise_reference(docs, k):
    """Pure-Python fixed-k substring excision (Lee et al. semantics as
    implemented): count every k-window occurrence; the canonical
    occurrence of each repeated window survives; every token covered by
    a non-canonical repeated window is removed. The implementation's
    canonical key is the STRING 'doc_id#<pos zero-padded to 10>' (the
    same key the DuckDB oracle uses), so e.g. doc '10' canonicalizes
    before doc '2' — the model must order the same way."""
    def key(doc_id, pos):
        return f"{doc_id}#{pos:010d}"

    occs = {}
    for doc_id, toks in docs:
        for i in range(len(toks) - k + 1):
            occs.setdefault(tuple(toks[i:i + k]), []).append(
                key(doc_id, i))
    out = {}
    for doc_id, toks in docs:
        covered = [False] * len(toks)
        for i in range(len(toks) - k + 1):
            g = tuple(toks[i:i + k])
            if len(occs[g]) > 1 and min(occs[g]) != key(doc_id, i):
                for j in range(i, i + k):
                    covered[j] = True
        kept = [t for t, c in zip(toks, covered) if not c]
        out[doc_id] = (kept, sum(covered))
    return out


@st.composite
def token_corpora(draw):
    """Small-vocabulary corpora so repeated k-windows actually occur;
    doc ids cross the 9→10 boundary so the string-key canonical
    ordering (doc '10' before doc '2') is actually exercised."""
    n = draw(st.integers(1, 13))
    return [(i, draw(st.lists(st.integers(0, 3), min_size=0,
                              max_size=14)))
            for i in range(n)]


@given(token_corpora(), st.sampled_from([2, 3]))
@settings(**SETTINGS)
def test_substring_excise_matches_python_model(spark, docs, k):
    from tbl_spark.pipelines.dedup import substring_excise
    df = spark.createDataFrame(docs,
                               "doc_id bigint, tokens array<int>")
    got = {r["doc_id"]: (list(r["tokens"]), r["n_removed"]) for r in
           substring_excise(df, k=k, gram_repr="string").collect()}
    assert got == _excise_reference(docs, k)


def _exact_dedup_reference(docs):
    """Keep the smallest doc_id per distinct text; NULL texts are their
    own group (exact_dedup groups by hash of the text value)."""
    best = {}
    for doc_id, text in docs:
        if text not in best or doc_id < best[text]:
            best[text] = doc_id
    return set(best.values())


@given(st.lists(st.tuples(st.integers(0, 1000),
                          st.sampled_from(["a", "bb", "ccc", "d d",
                                           ""])),
                min_size=1, max_size=40, unique_by=lambda t: t[0]))
@settings(**SETTINGS)
def test_exact_dedup_matches_python_model(spark, rows):
    from tbl_spark.pipelines.dedup import exact_dedup
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    kept = {r["doc_id"] for r in exact_dedup(df).collect()}
    assert kept == _exact_dedup_reference(rows)


@given(st.lists(st.tuples(st.integers(0, 5000),
                          st.sampled_from(["s1", "s2", "s3"])),
                min_size=1, max_size=50, unique_by=lambda t: t[0]),
       st.sampled_from([0.0, 0.3, 1.0]))
@settings(**SETTINGS)
def test_stratified_sample_matches_python_model(spark, rows, rate):
    import hashlib
    from tbl_spark.pipelines.sampling import stratified_sample
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    kept = {r["doc_id"] for r in stratified_sample(
        df, "source", {"s1": rate, "s2": 1.0}, key_col="doc_id",
        default_rate=0.5).collect()}

    def u(key):
        return int(hashlib.md5(str(key).encode()).hexdigest()[:15],
                   16) / float(1 << 60)

    rates = {"s1": rate, "s2": 1.0, "s3": 0.5}
    expect = {k for k, s in rows if u(k) < rates[s]}
    assert kept == expect
