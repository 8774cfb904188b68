"""Text-analysis operator semantics."""

from __future__ import annotations

import hashlib

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops import text as textops


def test_predict_lang_real_samples():
    samples = {
        "en": "the cat sat on the mat and it was happy that the sun was out",
        "de": "der hund ist nicht mit der katze in das haus gegangen und die",
        "fr": "le chat est dans la maison et les oiseaux sont sur le toit pour",
        "es": "el perro está en la casa y los gatos son de la ciudad que es",
        "zh": "这是一个中文句子用来测试语言识别",
    }
    for lang, s in samples.items():
        assert textops.predict_lang(s) == lang, (lang, s)
    assert textops.predict_lang("") == "unknown"
    assert textops.predict_lang("qwzx 12345 zzz") == "unknown"


def _docs():
    return ray.data.from_items(
        [
            {"doc_id": 0, "text": "Hello world! This is a test."},
            {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": "one two  three\nfour"},
        ]
    )


def test_token_counts():
    out = textops.token_count_stage(_docs()).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 6
    assert out.loc[1, "n_tokens"] == 0
    assert out.loc[2, "n_tokens"] == 4
    assert out.loc[0, "n_bpe_tokens"] == 8  # words + '!' + '.'


def test_char_stats():
    out = textops.char_stats_stage(_docs()).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_chars"] == 28
    assert out.loc[1, "n_chars"] == 0
    assert 0 < out.loc[0, "punct_ratio"] < 0.2


def test_quality_orders_sensibly():
    good = " ".join(["the quick brown fox jumps over the lazy dog."] * 20)
    bad = "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( ))))"
    ds = ray.data.from_items(
        [{"doc_id": 0, "text": good}, {"doc_id": 1, "text": bad}]
    )
    out = textops.quality_stage(ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "quality"] > out.loc[1, "quality"]


def test_fingerprints_match_md5():
    out = textops.fingerprint_stage(_docs()).to_pandas().set_index("doc_id")
    assert out.loc[0, "fp_md5"] == hashlib.md5(
        "Hello world! This is a test.".encode()
    ).hexdigest()
    assert out.loc[0, "fp_rolling"] != out.loc[2, "fp_rolling"]


def test_repetition_stage_planted():
    rows = [
        # "a b" bigram occurs 3x; trigram "a b a" (x2) and "b a b" (x2)
        # cover positions 0..4 of "a b a b a"
        {"doc_id": 0, "text": "a b a b a x y z"},
        {"doc_id": 1, "text": "all distinct tokens here now"},
        {"doc_id": 2, "text": "solo"},
    ]
    out = (
        textops.repetition_stage(ray.data.from_items(rows))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "n_tokens"] == 8
    assert out.loc[0, "top_bigram_count"] == 2  # "a b" at 0 and 2
    assert out.loc[0, "dup_trigram_covered"] == 5  # positions 0-4
    assert out.loc[1, "top_bigram_count"] == 1
    assert out.loc[1, "dup_trigram_covered"] == 0
    assert out.loc[2, "n_tokens"] == 1
    assert out.loc[2, "top_bigram_count"] == 0


def test_pii_scrub_stage():
    rows = [
        {"doc_id": 0, "text": "mail bob@x.example.com and al.b+c@y.org now"},
        {"doc_id": 1, "text": "call 555-123-4567 or 555-000-1111"},
        {"doc_id": 2, "text": "host 10.1.2.3 clean 1234-567-8901x"},
        {"doc_id": 3, "text": "nothing personal here"},
    ]
    out = (
        textops.pii_scrub_stage(ray.data.from_items(rows))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "clean_text"] == "mail <EMAIL> and <EMAIL> now"
    assert out.loc[0, "n_emails"] == 2
    assert out.loc[1, "clean_text"] == "call <PHONE> or <PHONE>"
    assert out.loc[1, "n_phones"] == 2
    # 1234-567-8901x: no word boundary before the phone shape -> kept
    assert out.loc[2, "clean_text"] == "host <IP> clean 1234-567-8901x"
    assert out.loc[2, "n_ips"] == 1
    assert out.loc[3, "clean_text"] == "nothing personal here"
    assert int(out.loc[3, ["n_emails", "n_phones", "n_ips"]].sum()) == 0


def test_decontaminate_stage_planted(ray_session):
    """A doc sharing a 5-gram window with the benchmark is flagged; a
    disjoint doc is not; the benchmark doc flags itself."""
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.text import (
        benchmark_ngram_ref,
        decontaminate_stage,
    )

    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    docs = ray.data.from_items(
        [
            {"doc_id": 0, "text": bench_text},  # the benchmark doc itself
            # shares the window "quick brown fox jumps over"
            {"doc_id": 1, "text": "she saw a quick brown fox jumps over there"},
            {"doc_id": 2, "text": "completely unrelated words in this one here"},
            {"doc_id": 3, "text": "too short"},  # < n tokens: 0 grams
        ]
    )
    bench = docs.filter(lambda r: r["doc_id"] == 0)
    ref = benchmark_ngram_ref(bench, n=5)
    out = (
        decontaminate_stage(docs, ref, n=5, min_hits=1)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[0, "contaminated"]) and out.loc[0, "hits"] == out.loc[0, "ngrams"]
    assert bool(out.loc[1, "contaminated"]) and out.loc[1, "hits"] >= 1
    assert not bool(out.loc[2, "contaminated"]) and out.loc[2, "hits"] == 0
    assert out.loc[3, "ngrams"] == 0 and not bool(out.loc[3, "contaminated"])


def test_tfidf_keywords_join_path_equals_broadcast(sf_dir):
    """The vocab-over-limit hash-join path must produce exactly the
    broadcast path's (doc_id, token, tf, df, score, rank) rows."""
    import pandas as pd

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.text import (
        tfidf_doc_keywords,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).limit(120)

    def _canon(ds):
        df = ds.to_pandas()
        df["score"] = df["score"].round(9)
        return (
            df.reindex(sorted(df.columns), axis=1)
            .sort_values(["doc_id", "rank"], kind="mergesort")
            .reset_index(drop=True)
        )

    fast = _canon(tfidf_doc_keywords(docs, k=5))
    slow = _canon(tfidf_doc_keywords(docs, k=5, vocab_broadcast_limit=0))
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert (fast.groupby("doc_id")["rank"].max() <= 5).all()
    assert (fast["rank"] >= 1).all()


def test_source_quality_gate_drops_bad_group():
    good = (
        "The quick brown fox jumps over the lazy dog and it was a fine day. "
        * 12
    )
    junk = "@@## 1234 %%^^ && !!"
    rows = [
        {"doc_id": i, "source": "good", "text": good} for i in range(4)
    ] + [{"doc_id": 10 + i, "source": "junk", "text": junk} for i in range(4)]
    ds = ray.data.from_items(rows)
    out = (
        textops.source_quality_gate(ds, threshold=0.5, min_docs=1)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert set(out["source"]) == {"good"}
    assert len(out) == 4
    assert (out["src_n_docs"] == 4).all()
    q_good, _, _ = textops.quality_of(good)
    assert abs(out["src_mean_quality"].iloc[0] - q_good) < 1e-12

    # min_docs gates out groups below the census floor even if clean
    out2 = textops.source_quality_gate(ds, threshold=0.5, min_docs=5)
    assert out2.count() == 0


def test_clean_lines_c4_semantics():
    doc = "\n".join(
        [
            "Short line",                              # <3 words
            "This is a good long sentence.",           # kept
            "menu | nav | bar",                        # 3 words, no terminal
            'He said the word was "quoted"',           # kept: " is terminal
            "Another proper sentence ends here!   ",   # kept (rstrip)
            "   ",                                     # blank — structural
            "no terminal punctuation on this line",
        ]
    )
    ds = ray.data.from_items(
        [{"doc_id": 1, "text": doc}, {"doc_id": 2, "text": "nav bar"}]
    )
    out = textops.clean_lines_stage(ds, min_words=3).to_pandas()
    assert list(out["doc_id"]) == [1]  # doc 2 keeps nothing and is dropped
    row = out.iloc[0]
    assert row["clean_text"] == (
        "This is a good long sentence.\n"
        'He said the word was "quoted"\n'
        "Another proper sentence ends here!   "
    )
    assert row["n_kept"] == 3 and row["n_dropped"] == 3

    # word-minimum-only mode for punctuation-free corpora
    out2 = textops.clean_lines_stage(
        ds, min_words=3, require_terminal=False
    ).to_pandas()
    assert out2.loc[out2["doc_id"] == 1, "n_kept"].iloc[0] == 5


def test_gopher_rules_planted():
    passing = (
        "The results of the study show that models have improved with "
        "scale and that data quality matters a great deal to the final "
        "outcome of the training run. " * 3
    )
    bullets = "\n".join(["- item one here", "- item two here", "* item three"])
    dots = "\n".join(["to be continued...", "and that of more...", "have with..."])
    symbols = "## " * 60 + "the of"
    f = textops.gopher_rules_of(passing)
    assert f["pass"] and all(f.values())
    f = textops.gopher_rules_of(bullets)            # 100% bullet lines
    assert not f["r_bullet"] and not f["pass"]
    f = textops.gopher_rules_of(dots)               # 100% ellipsis lines
    assert not f["r_ellipsis"]
    f = textops.gopher_rules_of(symbols)            # symbol ratio > 0.1
    assert not f["r_sym"]
    f = textops.gopher_rules_of("word " * 10)       # too short, no stopwords
    assert not f["r_wc"] and not f["r_stop"]
    f = textops.gopher_rules_of("")                 # degenerate
    assert not f["pass"]

    ds = ray.data.from_items([{"doc_id": 1, "text": passing}])
    out = textops.gopher_rules_stage(ds).to_pandas()
    assert out.loc[0, "pass"] == 1 and out.loc[0, "r_stop"] == 1


def test_bm25_ranks_relevant_docs_first():
    import numpy as np

    rows = [
        {"doc_id": 1, "text": "spark spark spark merge window and more words"},
        {"doc_id": 2, "text": "spark appears once in this longer padded doc " + "pad " * 40},
        {"doc_id": 3, "text": "nothing relevant here at all just filler words"},
        {"doc_id": 4, "text": "merge window merge window"},
    ]
    out = textops.bm25_search(
        ray.data.from_items(rows), ["spark", "merge", "window"], k=3
    ).to_pandas()
    assert list(out["doc_id"])[:2] == [1, 4]       # doc 3 never ranks
    assert 3 not in set(out["doc_id"])
    assert (np.diff(out["score"].to_numpy()) <= 1e-12).all()  # desc order


def test_pmi_collocations_planted(ray_session):
    """A planted always-adjacent pair must out-PMI frequent-but-
    independent tokens; min_count drops rare noise."""
    import numpy as np
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.text import (
        pmi_collocations,
    )

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(20)]
    docs = []
    for d in range(30):
        toks = list(rng.choice(vocab, size=30))
        # plant 'neural network' as an inseparable bigram
        toks.insert(int(rng.integers(0, len(toks))), "neural")
        toks.insert(toks.index("neural") + 1, "network")
        docs.append({"doc_id": d, "text": " ".join(toks)})
    out = pmi_collocations(
        ray.data.from_items(docs), k=10, min_count=5
    ).to_pandas()
    assert out.iloc[0]["tok_a"] == "neural" and out.iloc[0]["tok_b"] == "network"
    assert (out["c_ab"] >= 5).all()
    # pmi sorted descending with deterministic tiebreak
    assert (out["pmi"].to_numpy()[:-1] >= out["pmi"].to_numpy()[1:]).all()


def test_explode_tokens_positions_and_empty_docs(ray_session):
    """One row per token occurrence with 1-based positions; docs with
    no tokens vanish; id columns replicate; casing folds."""
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.text import (
        explode_tokens,
    )

    docs = ray.data.from_items(
        [
            {"doc_id": 1, "text": "Alpha beta ALPHA"},
            {"doc_id": 2, "text": "   "},
            {"doc_id": 3, "text": "gamma"},
        ]
    )
    out = (
        explode_tokens(docs, "text", ["doc_id"])
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["doc_id", "pos", "word"]
    assert out["doc_id"].tolist() == [1, 1, 1, 3]
    assert out["pos"].tolist() == [1, 2, 3, 1]
    assert out["word"].tolist() == ["alpha", "beta", "alpha", "gamma"]


def test_tfidf_cosine_pairs_join_path_equals_broadcast(sf_dir):
    """The vocab-over-limit self-join plan must produce exactly the
    broadcast/block-matmul plan's (doc_a, doc_b, cosine) rows."""
    import pandas as pd

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.text import (
        tfidf_cosine_pairs,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "lang", "text"],
    ).limit(150)

    def _canon(ds):
        df = ds.to_pandas()
        df["cosine"] = df["cosine"].round(9)
        return df.sort_values(["doc_a", "doc_b"], kind="mergesort").reset_index(
            drop=True
        )

    fast = _canon(
        tfidf_cosine_pairs(docs, ["source", "lang"], threshold=0.6)
    )
    slow = _canon(
        tfidf_cosine_pairs(
            docs, ["source", "lang"], threshold=0.6, vocab_broadcast_limit=0
        )
    )
    assert len(fast) > 0
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert (fast["doc_a"] < fast["doc_b"]).all()
    assert (fast["cosine"] >= 0.6).all() and (fast["cosine"] <= 1.0 + 1e-9).all()


def test_bpe_pair_counts_hand_checked(ray_session):
    import pandas as pd

    import ray.data
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.text import (
        bpe_pair_counts,
    )

    docs = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["low low lower", "new newer a"]}
    )
    got = (
        bpe_pair_counts(ray.data.from_pandas(docs).repartition(2), k=100)
        .to_pandas()
        .set_index(["a", "b"])["n"]
        .to_dict()
    )
    # low ×2 + lower: lo×3, ow×3, we×2, er×2 (lower + newer)
    assert got[("l", "o")] == 3
    assert got[("o", "w")] == 3
    assert got[("w", "e")] == 2
    assert got[("e", "r")] == 2
    assert got[("n", "e")] == 2  # new + newer
    assert got[("e", "w")] == 2
    # single-char word 'a' contributes nothing; 14 pairs total
    assert sum(got.values()) == 14


def test_vocab_oov_counts(ray_session):
    import pandas as pd
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.text import vocab_oov

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a a b", "a c", "z z z z"],
        }
    )
    # k=2 vocab by (count desc, token asc): a(3), z(4) -> top2 = z, a
    out = (
        vocab_oov(ray.data.from_pandas(df), k=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [3, 2, 4]
    # vocab = {z, a}; oov: b -> 1; c -> 1; none -> 0
    assert out["n_oov"].tolist() == [1, 1, 0]
    assert abs(out["oov_rate"].iloc[0] - 0.333333) < 1e-9
