"""Composed corpus curation pipeline."""

from lamindb_spark.pipeline.corpus import curate_corpus
from lamindb_spark.sources.literals import literal_table


def test_curate_corpus_verdicts(spark):
    docs = literal_table(
        spark,
        [
            (1, "the cat and the dog of a house sat on the mat near the door and slept all day " * 3),
            (2, "the cat and the dog of a house sat on the mat near the door and slept all day " * 3),  # dup of 1
            (3, "el perro y el gato de la casa que los dos " * 5),  # spanish
            (4, "tiny"),  # too short
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in curate_corpus(docs).collect()}
    assert out[1]["keep"] is True and out[1]["is_keeper"] is True and out[1]["n_copies"] == 2
    assert out[2]["keep"] is False and out[2]["is_keeper"] is False  # dup loser
    assert out[3]["keep"] is False and out[3]["pred_lang"] == "es"
    assert out[4]["keep"] is False and out[4]["n_tokens"] == 1
