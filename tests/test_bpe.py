"""Relational BPE merge training (round 9): closed-form anchors for
the greedy leftmost application — including the x == y run-parity
case — on constructed vocabularies. Fixture values are oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_generator_demo_spark.operators.bpe import bpe_merge_step


def _state(spark, words):
    """words: dict word -> count, exploded to the char symbol state."""
    vocab = spark.createDataFrame(
        list(words.items()), "word string, wcount long"
    )
    return vocab.select(
        "word", "wcount", F.posexplode(F.split("word", "")).alias("pos", "sym")
    )


def _word(state, w):
    rows = sorted(
        state.filter(F.col("word") == w).collect(), key=lambda r: r.pos
    )
    return [r.sym for r in rows]


class TestGreedyApplication:
    def test_simple_merge_and_winner(self, spark):
        top, nxt = bpe_merge_step(_state(spark, {"abab": 3, "abc": 2}))
        trow = top.first()
        # (a,b) appears 2*3 + 1*2 = 8 times; (b,a) 3, (b,c) 2
        assert (trow.x, trow.y, trow.cnt) == ("a", "b", 8)
        assert _word(nxt, "abab") == ["ab", "ab"]
        assert _word(nxt, "abc") == ["ab", "c"]

    def test_identical_pair_run_parity(self, spark):
        # 'aaaa' under merge (a,a): greedy leftmost -> [aa, aa];
        # 'aaa' -> [aa, a]; 'aaaaa' -> [aa, aa, a]
        top, nxt = bpe_merge_step(
            _state(spark, {"aaaa": 5, "aaa": 1, "aaaaa": 1})
        )
        trow = top.first()
        # (a,a) count = 3*5 + 2*1 + 4*1 = 21
        assert (trow.x, trow.y, trow.cnt) == ("a", "a", 21)
        assert _word(nxt, "aaaa") == ["aa", "aa"]
        assert _word(nxt, "aaa") == ["aa", "a"]
        assert _word(nxt, "aaaaa") == ["aa", "aa", "a"]

    def test_two_runs_in_one_word(self, spark):
        # 'aabaa': runs of a's separated by b -> each run merges at its
        # own start: [aa, b, aa]
        _, nxt = bpe_merge_step(_state(spark, {"aabaa": 9}))
        assert _word(nxt, "aabaa") == ["aa", "b", "aa"]

    def test_chained_steps_build_longer_symbols(self, spark):
        # step 1 merges (a,b) -> 'ab'; step 2 merges ('ab','c')
        s = _state(spark, {"abc": 10, "abd": 4})
        top1, s1 = bpe_merge_step(s)
        assert (top1.first().x, top1.first().y) == ("a", "b")
        top2, s2 = bpe_merge_step(s1.localCheckpoint(eager=True))
        t2 = top2.first()
        assert (t2.x, t2.y, t2.cnt) == ("ab", "c", 10)
        assert _word(s2, "abc") == ["abc"]
        assert _word(s2, "abd") == ["ab", "d"]

    def test_tie_breaks_lexicographic(self, spark):
        # (x,y) and (a,b) both count 1 -> (a,b) wins the tie
        top, _ = bpe_merge_step(_state(spark, {"xy": 1, "ab": 1}))
        trow = top.first()
        assert (trow.x, trow.y) == ("a", "b")
