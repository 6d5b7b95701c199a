"""Independent-truth checks, wave 8: the text tier end-to-end — token
counts, language-ID and its confusion matrix/kappa, fingerprints,
repetition stats, rolling hashes, percentiles, vocabulary building and
encoding, co-occurrence lift, quality scores, TF-IDF, postings, bigram
rarity, novelty, BM25-lite, BPE merge candidates, and the hashing
vectorizer.

Replication contract as in waves 1–7: every tokenizer convention is
re-run with Python ``re`` over the raw parquet text, every aggregate
with dicts/Counters, every rational with the integer round_ratio6 idiom
or repr-based HALF_UP quantization — no Spark expressions, no SQL.
Integers and strings compare exactly; engine-rounded doubles within
1e-9.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from aos_spark.queries import QUERIES


def _close(a, b, rel=1e-9, abs_=1e-9):
    assert math.isclose(a, b, rel_tol=rel, abs_tol=abs_), (a, b)


def round_ratio6(num: int, den: int) -> float:
    return ((num * 2_000_000 + den) // (den * 2)) / 1e6


def scaled_round6(x: float) -> float:
    """ROUND(x * 1e6, 0) / 1e6 with repr-based HALF_UP (Spark's cast)."""
    return float(
        Decimal(repr(x * 1_000_000.0)).quantize(Decimal(1), ROUND_HALF_UP)
    ) / 1e6


def md5_32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def norm_tokens(text: str) -> list[str]:
    """trim(regexp_replace(lower, '[^a-z0-9]+', ' ')) split on \\s+ —
    empty doc yields [''] like string_split_regex."""
    t = re.sub(r"[^a-z0-9]+", " ", (text or "").lower()).strip()
    return t.split(" ") if t else [""]


def filt_tokens(text: str) -> list[str]:
    """list_filter(split(lower, '[^a-z0-9]+'), x -> x <> '')."""
    return [w for w in re.split(r"[^a-z0-9]+", (text or "").lower()) if w]


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _rows(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir).collect()


def test_text_token_count(spark, sf_dir, docs):
    expect = {}
    for r in docs.itertuples():
        t = (r.text or "").strip()
        expect[r.doc_id] = (r.lang, len(re.split(r"\s+", t)) if t else 0)
    got = {
        r["doc_id"]: (r["lang"], r["n_tokens"])
        for r in _rows(spark, sf_dir, "text_token_count")
    }
    assert got == expect


_MARKERS = {
    "de": r"\b(der|die|und|das|ist)\b",
    "en": r"\b(the|and|of|to|is)\b",
    "es": r"\b(el|la|de|que|los)\b",
    "fr": r"\b(le|la|et|les|des)\b",
}


def _detect(text: str) -> str:
    low = (text or "").lower()
    scores = {lang: len(re.findall(p, low)) for lang, p in _MARKERS.items()}
    best = max(scores.values())
    if best <= 0:
        return "und"
    for lang in ("de", "en", "es", "fr"):  # the CASE's tie priority
        if scores[lang] == best:
            return lang
    return "und"


def test_text_language_id(spark, sf_dir, docs):
    expect = {
        r.doc_id: (r.lang, _detect(r.text)) for r in docs.itertuples()
    }
    got = {
        r["doc_id"]: (r["labeled_lang"], r["detected_lang"])
        for r in _rows(spark, sf_dir, "text_language_id")
    }
    assert got == expect


def test_language_confusion_matrix(spark, sf_dir, docs):
    conf: Counter = Counter()
    row_tot: Counter = Counter()
    for r in docs.itertuples():
        det = _detect(r.text)
        conf[(r.lang, det)] += 1
        row_tot[r.lang] += 1
    expect = {
        (lab, det): (n, round_ratio6(n, row_tot[lab]))
        for (lab, det), n in conf.items()
    }
    got = {
        (r["labeled_lang"], r["detected_lang"]): (r["n_docs"], r["share"])
        for r in _rows(spark, sf_dir, "language_confusion_matrix")
    }
    assert got == expect


def test_language_kappa(spark, sf_dir, docs):
    conf: Counter = Counter()
    for r in docs.itertuples():
        conf[(r.lang, _detect(r.text))] += 1
    n = sum(conf.values())
    agree = sum(v for (a, b), v in conf.items() if a == b)
    rows: Counter = Counter()
    cols: Counter = Counter()
    for (a, b), v in conf.items():
        rows[a] += v
        cols[b] += v
    pe = sum(rows[lbl] * cols[lbl] for lbl in rows if lbl in cols)
    got = _rows(spark, sf_dir, "language_kappa")[0]
    assert (got["n_docs"], got["n_agree"]) == (n, agree)
    denom = n * n - pe
    if denom == 0:
        assert got["kappa"] is None
    else:
        _close(got["kappa"], float(
            Decimal(repr(float(n * agree - pe) / denom)).quantize(
                Decimal(1).scaleb(-6), ROUND_HALF_UP
            )
        ))


def test_text_fingerprint(spark, sf_dir, docs):
    expect = {
        r.doc_id: hashlib.md5(
            re.sub(r"[^a-z0-9]+", " ", (r.text or "").lower()).strip().encode()
        ).hexdigest()[:16]
        for r in docs.itertuples()
    }
    got = {
        r["doc_id"]: r["fingerprint"]
        for r in _rows(spark, sf_dir, "text_fingerprint")
    }
    assert got == expect


def test_text_repetition_stats(spark, sf_dir, docs):
    expect = {}
    for r in docs.itertuples():
        t = norm_tokens(r.text)
        if len(t) >= 2:
            c2 = Counter(
                " ".join(t[i : i + 2]) for i in range(len(t) - 1)
            )
            top2 = round_ratio6(max(c2.values()), sum(c2.values()))
        else:
            top2 = 0.0
        if len(t) >= 5:
            c5 = Counter(
                " ".join(t[i : i + 5]) for i in range(len(t) - 4)
            )
            dup5 = round_ratio6(
                sum(c5.values()) - len(c5), sum(c5.values())
            )
        else:
            dup5 = 0.0
        expect[r.doc_id] = (top2, dup5)
    got = {
        r["doc_id"]: (r["top_2gram_frac"], r["dup_5gram_frac"])
        for r in _rows(spark, sf_dir, "text_repetition_stats")
    }
    assert got == expect


def test_text_rolling_fingerprint(spark, sf_dir, docs):
    expect = {}
    for r in docs.itertuples():
        acc = 0
        for tok in filt_tokens(r.text):
            acc = (acc * 31 + md5_32(tok)) % 1_000_000_007
        expect[r.doc_id] = acc
    got = {
        r["doc_id"]: r["rolling_fp"]
        for r in _rows(spark, sf_dir, "text_rolling_fingerprint")
    }
    assert got == expect


def test_corpus_length_percentiles(spark, sf_dir, docs):
    expect = {}
    for lang, g in docs.groupby("lang"):
        vals = sorted(zip(g["n_chars"], g["doc_id"]))
        n = len(vals)
        pct = {}
        for p, col in ((0.25, 0), (0.50, 1), (0.75, 2)):
            pct[col] = next(
                vals[i][0] for i in range(n) if (i + 1) / n >= p
            )
        expect[lang] = (n, pct[0], pct[1], pct[2], max(v for v, _ in vals))
    got = {
        r["lang"]: (r["n_docs"], r["p25_chars"], r["p50_chars"],
                    r["p75_chars"], r["max_chars"])
        for r in _rows(spark, sf_dir, "corpus_length_percentiles")
    }
    assert got == expect


def test_vocab_min_df(spark, sf_dir, docs):
    df: Counter = Counter()
    for r in docs.itertuples():
        for term in set(filt_tokens(r.text)):
            df[term] += 1
    expect = {t: c for t, c in df.items() if c >= 5}
    got = {r["term"]: r["df"] for r in _rows(spark, sf_dir, "vocab_min_df")}
    assert got == expect and expect


def test_vocab_encode_tokens(spark, sf_dir, docs):
    df: Counter = Counter()
    toks = {}
    for r in docs.itertuples():
        toks[r.doc_id] = filt_tokens(r.text)
        for term in set(toks[r.doc_id]):
            df[term] += 1
    vocab = sorted(
        ((t, c) for t, c in df.items() if c >= 5),
        key=lambda tc: (-tc[1], tc[0]),
    )
    ids = {t: i + 1 for i, (t, _c) in enumerate(vocab)}
    expect = {}
    for doc_id, ts in toks.items():
        enc = [str(ids[t]) for t in ts if t in ids]
        if enc:
            expect[doc_id] = ",".join(enc)
    got = {
        r["doc_id"]: r["token_ids"]
        for r in _rows(spark, sf_dir, "vocab_encode_tokens")
    }
    assert got == expect and expect


def test_term_cooccurrence_lift(spark, sf_dir, docs):
    term_docs: dict[str, set] = defaultdict(set)
    doc_terms = {}
    for r in docs.itertuples():
        ts = set(filt_tokens(r.text))
        doc_terms[r.doc_id] = ts
        for t in ts:
            term_docs[t].add(r.doc_id)
    n_docs = len({d for s in term_docs.values() for d in s})
    pair_count: Counter = Counter()
    for ts in doc_terms.values():
        st = sorted(ts)
        for i in range(len(st)):
            for j in range(i + 1, len(st)):
                pair_count[(st[i], st[j])] += 1
    expect = {}
    for (a, b), nxy in pair_count.items():
        if nxy >= 5:
            da, db = len(term_docs[a]), len(term_docs[b])
            expect[(a, b)] = (
                nxy, da, db, round_ratio6(nxy * n_docs, da * db)
            )
    got = {
        (r["term_a"], r["term_b"]):
            (r["n_xy"], r["df_a"], r["df_b"], r["lift"])
        for r in _rows(spark, sf_dir, "term_cooccurrence_lift")
    }
    assert got == expect and expect


def _quality(text: str):
    t = text or ""
    n_chars = len(t)
    n_alpha = len(re.sub(r"[^A-Za-z]", "", t))
    n_punct = len(re.sub(r"[^.,;:!?'\"()\[\]]", "", t))
    stripped = t.strip()
    n_tokens = len(re.split(r"\s+", stripped)) if stripped else 0
    stop_hits = len(re.findall(r"\b(and|is|of|the|to)\b", t.lower()))
    alpha = round_ratio6(n_alpha, max(n_chars, 1))
    punct = round_ratio6(n_punct, max(n_chars, 1))
    stop = round_ratio6(stop_hits, max(n_tokens, 1))
    score = (0.5 if punct > 0.3 else 1.0) * (
        0.4 * min(stop * 4, 1.0) + 0.4 * alpha + 0.2 * min(n_tokens / 100.0, 1.0)
    )
    return n_tokens, alpha, punct, stop, scaled_round6(score)


def test_text_quality_score(spark, sf_dir, docs):
    expect = {r.doc_id: _quality(r.text) for r in docs.itertuples()}
    got = {
        r["doc_id"]: (r["n_tokens"], r["alpha_ratio"], r["punct_ratio"],
                      r["stopword_ratio"], r["quality"])
        for r in _rows(spark, sf_dir, "text_quality_score")
    }
    assert got == expect


def test_tfidf_top_terms(spark, sf_dir, docs):
    tf: dict[int, Counter] = {}
    df: Counter = Counter()
    for r in docs.itertuples():
        c = Counter(t for t in norm_tokens(r.text) if t)
        tf[r.doc_id] = c
        for term in c:
            df[term] += 1
    n = len(docs)
    expect = {}
    for doc_id, c in tf.items():
        scored = sorted(
            (
                (-scaled_round6(
                    float(cnt) * ((float(n) - float(df[t]) + 0.5)
                                  / (float(df[t]) + 0.5))
                ), t)
                for t, cnt in c.items()
            )
        )
        for rank, (negs, term) in enumerate(scored[:3], 1):
            expect[(doc_id, rank)] = (term, -negs)
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tfidf"])
        for r in _rows(spark, sf_dir, "tfidf_top_terms")
    }
    assert got == expect and expect


def test_term_postings_index(spark, sf_dir, docs):
    per: dict[str, dict[int, int]] = defaultdict(dict)
    for r in docs.itertuples():
        for t, c in Counter(filt_tokens(r.text)).items():
            per[t][r.doc_id] = c
    expect = {}
    for term, dmap in per.items():
        if len(dmap) >= 2:
            expect[term] = (
                len(dmap),
                sum(dmap.values()),
                ",".join(str(d) for d in sorted(dmap)[:20]),
            )
    got = {
        r["term"]: (r["df"], r["tf_total"], r["postings"])
        for r in _rows(spark, sf_dir, "term_postings_index")
    }
    assert got == expect and expect


def test_lm_bigram_rarity(spark, sf_dir, docs):
    grams: dict[int, list] = {}
    freq: Counter = Counter()
    for r in docs.itertuples():
        t = [w for w in re.split(r"[^a-z0-9']+", (r.text or "").lower()) if w]
        g = [f"{t[i]} {t[i+1]}" for i in range(len(t) - 1)]
        grams[r.doc_id] = g
        freq.update(g)
    expect = {}
    for doc_id, g in grams.items():
        if g:
            rare = sum(1 for x in g if freq[x] <= 2)
            expect[doc_id] = (len(g), rare, rare / len(g))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_rare"], r["rare_frac"])
        for r in _rows(spark, sf_dir, "lm_bigram_rarity")
    }
    assert set(got) == set(expect)
    for k, (nb, nr, frac) in expect.items():
        assert got[k][:2] == (nb, nr), k
        _close(got[k][2], frac, rel=1e-12, abs_=1e-12)


def test_ngram_novelty_rate(spark, sf_dir, docs):
    first_doc: dict[str, int] = {}
    doc_grams = {}
    for r in sorted(docs.itertuples(), key=lambda x: x.doc_id):
        t = norm_tokens(r.text)
        if len(t) >= 2:
            g = set(f"{t[i]} {t[i+1]}" for i in range(len(t) - 1))
        else:
            g = {" ".join(t)}
        doc_grams[r.doc_id] = (r.source, g)
        for x in g:
            first_doc.setdefault(x, r.doc_id)
    per_source: dict[str, list] = defaultdict(lambda: [0, 0])
    for doc_id, (source, g) in doc_grams.items():
        for x in g:
            per_source[source][0] += 1
            if first_doc[x] == doc_id:
                per_source[source][1] += 1
    expect = {
        s: (n, nov, round_ratio6(nov, n))
        for s, (n, nov) in per_source.items()
    }
    got = {
        r["source"]: (r["n_grams"], r["n_novel"], r["novelty_rate"])
        for r in _rows(spark, sf_dir, "ngram_novelty_rate")
    }
    assert got == expect and expect


def test_bm25_lite_scores(spark, sf_dir, docs):
    tf = {}
    for r in docs.itertuples():
        c = Counter(t for t in norm_tokens(r.text) if t in ("hash", "join", "table"))
        if c:
            tf[r.doc_id] = (c.get("hash", 0), c.get("join", 0), c.get("table", 0))
    n_total = len(docs)
    dfs = [sum(1 for v in tf.values() if v[i] > 0) for i in range(3)]
    scored = []
    for doc_id, (th, tj, tt) in tf.items():
        parts = [
            ((float(n_total - dfs[i]) + 0.5) / (float(dfs[i]) + 0.5))
            * ((float(x) * 2.2) / (float(x) + 1.2))
            for i, x in enumerate((th, tj, tt))
        ]
        score = (parts[0] + parts[1]) + parts[2]
        scored.append((
            -float(Decimal(repr(score)).quantize(
                Decimal(1).scaleb(-6), ROUND_HALF_UP)),
            doc_id, th, tj, tt,
        ))
    scored.sort()
    expect = [
        (doc_id, th, tj, tt, -negs)
        for negs, doc_id, th, tj, tt in scored[:20]
    ]
    got = [
        (r["doc_id"], r["tf_hash"], r["tf_join"], r["tf_table"], r["bm25_lite"])
        for r in _rows(spark, sf_dir, "bm25_lite_scores")
    ]
    assert sorted(got) == sorted(expect) and expect


def test_bpe_merge_candidates(spark, sf_dir, docs):
    words: Counter = Counter()
    for r in docs.itertuples():
        words.update(w for w in filt_tokens(r.text) if len(w) >= 2)
    pair_count: Counter = Counter()
    for w, freq in words.items():
        for i in range(len(w) - 1):
            pair_count[w[i : i + 2]] += freq
    top = sorted(pair_count.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expect = {
        pair: (cnt, i + 1) for i, (pair, cnt) in enumerate(top)
    }
    got = {
        r["pair"]: (r["merge_count"], r["rank_in_group"])
        for r in _rows(spark, sf_dir, "bpe_merge_candidates")
    }
    assert got == expect and expect


def test_feature_hash_vectorizer(spark, sf_dir, docs):
    expect = {}
    for r in docs.itertuples():
        buckets: Counter = Counter()
        for t in norm_tokens(r.text):
            if t:
                buckets[md5_32("fh" + t) % 256] += 1
        if buckets:
            expect[r.doc_id] = (
                len(buckets),
                sum(buckets.values()),
                ",".join(f"{b}:{c}" for b, c in sorted(buckets.items())),
            )
    got = {
        r["doc_id"]: (r["n_features"], r["n_tokens"], r["fvec"])
        for r in _rows(spark, sf_dir, "feature_hash_vectorizer")
    }
    assert got == expect and expect
