"""Golden tests mirroring /root/reference/tests/test_base_mappers.py (word
count) and tests/test_reducers.py (sum per key)."""

from __future__ import annotations

from yamr_spark.operators.wordcount import top_words, tokens, word_count


def _counts(spark, text):
    df = spark.createDataFrame([(text,)], ["text"])
    return dict(word_count(df).collect())


def test_simple_words(spark):
    # test_base_mappers.py:10-14: "aa yy jj aa" -> aa:2, yy:1, jj:1
    assert _counts(spark, "aa yy jj aa") == {"aa": 2, "yy": 1, "jj": 1}


def test_punctuation_and_whitespace(spark):
    # test_base_mappers.py:25-32
    assert _counts(spark, "  aa cc.   yy jj,   aa") == {
        "aa": 2,
        "cc": 1,
        "yy": 1,
        "jj": 1,
    }


def test_newlines(spark):
    # test_base_mappers.py:34-41
    assert _counts(spark, "aa cc\naa bb") == {"aa": 2, "cc": 1, "bb": 1}


def test_mixed_case_lowered(spark):
    assert _counts(spark, "Aa AA aa") == {"aa": 3}


def test_cyrillic_tokens(spark):
    # the reference's onegin corpus is Cyrillic; Python \w+ matches it
    assert _counts(spark, "Мой дядя самых честных правил мой") == {
        "мой": 2,
        "дядя": 1,
        "самых": 1,
        "честных": 1,
        "правил": 1,
    }


def test_empty_and_punct_only(spark):
    assert _counts(spark, " ,. ") == {}


def test_tokens_flatmap_shape(spark):
    df = spark.createDataFrame([("a b",), ("c",), ("",)], ["text"])
    got = sorted(r.word for r in tokens(df).collect())
    assert got == ["a", "b", "c"]


def test_multi_row_sum_per_key(spark):
    # test_reducers.py:18-23 end-to-end shape: repeated keys across rows sum
    df = spark.createDataFrame([("a a a cc",), ("dd dd zz",), ("zz",)], ["text"])
    assert dict(word_count(df).collect()) == {"a": 3, "cc": 1, "dd": 2, "zz": 2}


def test_top_words(spark):
    df = spark.createDataFrame([("a a a b b c",)], ["text"])
    got = [(r.word, r.cnt) for r in top_words(df, k=2).collect()]
    assert got == [("a", 3), ("b", 2)]


def test_word_count_on_documents(spark, sf_dir):
    from yamr_spark.tables import table
    docs = table(spark, sf_dir, "documents")
    wc = word_count(docs)
    assert wc.count() > 0
    assert wc.columns == ["word", "cnt"]
