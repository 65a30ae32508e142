"""Iterative BPE merge training: the space-wrapped replace encoding must
implement greedy leftmost-first non-overlapping merges exactly, merges
must cascade (a merged symbol can be the left/right of a later merge),
word boundaries must be unmergeable, and the memoized merge table must
equal a fresh build. Engine parity for both registered queries is
covered by tests/test_oracle_parity.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prueba_tecnica_http_client_etl_spark.operators import corpus as C

from tests.conftest import SF_SMOKE


def _wrap(word: str) -> str:
    return " " + "  ".join(word) + " "


def test_wrapped_replace_is_greedy_leftmost_nonoverlapping(spark):
    # 'aaaa' under merge (a,a) -> ['aa','aa']; 'aaa' -> ['aa','a']
    df = spark.createDataFrame([(_wrap("aaaa"),), (_wrap("aaa"),)], "w string")
    out = [
        r["w"]
        for r in df.select(
            F.replace(F.col("w"), F.lit(" a  a "), F.lit(" aa ")).alias("w")
        ).collect()
    ]
    assert out == [" aa  aa ", " aa  a "]


def test_top_pair_total_order(spark):
    # equal counts resolve by (left asc, right asc)
    words = spark.createDataFrame(
        [(_wrap("ab"), 3), (_wrap("ba"), 3)], "w string, cnt long"
    )
    top = C._bpe_top_pair(words)
    assert (top["l"], top["r"], top["c"]) == ("a", "b", 3)


def test_merges_cascade_and_respect_word_counts(spark):
    # corpus: 'abab' x2, 'ab' x3  -> pair (a,b) count 7 is merge 1;
    # then (ab,ab) count 2 beats nothing else with higher count
    rows = [("abab", 2), ("ab", 3)]
    words = spark.createDataFrame(
        [(_wrap(w), c) for w, c in rows], "w string, cnt long"
    )
    t1 = C._bpe_top_pair(words)
    assert (t1["l"], t1["r"], int(t1["c"])) == ("a", "b", 7)
    merged = words.select(
        F.replace(F.col("w"), F.lit(" a  b "), F.lit(" ab ")).alias("w"), "cnt"
    )
    t2 = C._bpe_top_pair(merged)
    assert (t2["l"], t2["r"], int(t2["c"])) == ("ab", "ab", 2)


def test_merge_table_artifact_memoized_equals_fresh(spark):
    from prueba_tecnica_http_client_etl_spark.functions import artifacts

    fresh = C._bpe_merge_rows(spark, SF_SMOKE)
    memo = [
        (r["merge_rank"], r["pair_left"], r["pair_right"], r["merged"], r["pair_count"])
        for r in C._bpe_merges_artifact(spark, SF_SMOKE).orderBy("merge_rank").collect()
    ]
    assert memo == fresh
    assert 0 < len(memo) <= C.BPE_MERGES
    # ranks are 1..n with cascading allowed: every merged symbol's parts
    # are either single chars or the result of an EARLIER merge
    seen = set()
    for rank, l, r, m, c in memo:
        assert m == l + r and c > 0
        for part in (l, r):
            assert len(part) == 1 or part in seen, (rank, part)
        seen.add(m)


def test_bpe_tokenize_symbol_accounting(spark):
    out = {r["doc_id"]: r for r in C.bpe_tokenize(spark, SF_SMOKE).collect()}
    assert len(out) == 500
    for r in out.values():
        # merges only ever reduce the symbol count, never below one
        # symbol per word; preview is a prefix of the symbol stream
        assert r["n_symbols"] >= r["n_words"] >= 0
        if r["n_symbols"]:
            assert len(r["symbols_preview"].split(" ")) <= C.BPE_PREVIEW_SYMBOLS


def test_merge_application_conserves_characters(spark):
    """Property: applying ANY merge sequence via the wrapped-replace
    encoding is a pure re-segmentation — the concatenation of the final
    symbols equals the original word, for every corpus word and the
    actually-trained merge list (hypothesis-style over the real data:
    500 words x 12 merges)."""
    from pyspark.sql import functions as F

    merges = C._bpe_merge_rows(spark, SF_SMOKE)
    words = [
        r["tok"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .selectExpr(
            "explode(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' ')) AS tok"
        )
        .filter(F.length("tok") > 0)
        .distinct()
        .limit(500)
        .collect()
    ]
    assert len(words) >= 20  # the synthetic corpus has a ~31-word vocabulary
    # adversarial additions: overlap runs, words equal to merged symbols,
    # and words containing a merge target at the boundary
    merged_syms = [m[3] for m in merges[:3]]
    words += ["aaaa", "aaab", "erer", "rere"] + merged_syms + [
        s + s for s in merged_syms
    ]
    for w in words:
        s = " " + "  ".join(w) + " "
        for _, l, r, _, _ in merges:
            s = s.replace(f" {l}  {r} ", f" {l}{r} ")
        syms = s.strip().split("  ")
        assert "".join(syms) == w, (w, syms)
        # and every symbol is either a single char or a trained merge
        trained = {m[3] for m in merges}
        for sym in syms:
            assert len(sym) == 1 or sym in trained, (w, sym)


def test_bpe_tokenize_zero_token_doc_parity(spark, tmp_path):
    """A whitespace-only document must tokenize to (0, '') in BOTH
    engines: DuckDB's array_to_string([], sep) returns NULL — without
    the d0 COALESCE the oracle's w goes NULL and n_symbols /
    symbols_preview come back NULL while Spark emits 0 / '' (ADVICE
    r16). Staged corpus: one real doc (so merges still train) + one
    empty + one whitespace-only doc."""
    import duckdb

    sf = str(tmp_path / "sf_empty")
    base = spark.read.parquet(SF_SMOKE + "/documents.parquet").limit(40)
    extra = spark.createDataFrame(
        [(900000, "", "en", "web", 0), (900001, "   \t  ", "en", "web", 6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    base.unionByName(extra).coalesce(1).write.mode("overwrite").parquet(
        sf + "/documents.parquet"
    )
    srows = {
        r["doc_id"]: (r["n_symbols"], r["symbols_preview"])
        for r in C.bpe_tokenize(spark, sf).collect()
    }
    assert srows[900000] == (0, "")
    assert srows[900001] == (0, "")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    drows = {
        d: (n, p) for d, _, n, p in con.sql(C.SQL_BPE_TOKENIZE).fetchall()
    }
    assert drows[900000] == (0, "")
    assert drows[900001] == (0, "")
    assert {d: (n, p) for d, _, n, p in [
        (doc, None, srows[doc][0], srows[doc][1]) for doc in srows
    ]} == drows
