"""Per-document overlapping chunking (pack.chunk_docs)."""

def test_chunk_docs_layout(spark):
    from pyspark.sql import Row
    from schisma_spark.functions.pack import chunk_docs

    df = spark.createDataFrame(
        [Row(doc_id=1, text="t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 toks
         Row(doc_id=2, text="a b c"),                           # 1 chunk
         Row(doc_id=3, text=None), Row(doc_id=4, text="  ")],   # no rows
        "doc_id int, text string",
    )
    out = chunk_docs(df, "text", "doc_id", chunk_tokens=4, overlap=1)
    rows = sorted((r["doc_id"], r["chunk_id"], r["start_tok"],
                   r["end_tok"], r["chunk_text"]) for r in out.collect())
    # doc 1: stride 3 -> starts 0,3,6 cover to 10? 0..4,3..7,6..10 -> 3
    assert rows == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 3, 7, "t3 t4 t5 t6"),
        (1, 2, 6, 10, "t6 t7 t8 t9"),
        (2, 0, 0, 3, "a b c"),
    ]
    # every token covered, final chunk ends exactly at n
    assert all(r[3] - r[2] <= 4 for r in rows)

    # overlap >= chunk_tokens raises
    import pytest
    with pytest.raises(ValueError):
        chunk_docs(df, "text", "doc_id", chunk_tokens=4, overlap=4)


def test_chunk_docs_full_coverage_property(spark):
    from pyspark.sql import Row
    from schisma_spark.functions.pack import chunk_docs

    texts = [" ".join(f"w{i}" for i in range(n))
             for n in (1, 4, 5, 6, 11, 23, 64)]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    out = chunk_docs(df, "text", "doc_id", chunk_tokens=5, overlap=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        n = len(t.split())
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        covered = set()
        for r in chunks:
            assert r["n_tokens"] == r["end_tok"] - r["start_tok"] > 0
            assert r["chunk_text"] == " ".join(
                t.split()[r["start_tok"]:r["end_tok"]])
            covered.update(range(r["start_tok"], r["end_tok"]))
        assert covered == set(range(n)), (i, n)
        assert chunks[-1]["end_tok"] == n  # never a sliver past the end
        # consecutive chunks overlap by exactly `overlap` (except last)
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_tok"] - a["start_tok"] == 3
