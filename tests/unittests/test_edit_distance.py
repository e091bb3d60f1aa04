from speechbrain_tpu.utils.edit_distance import (
    accumulatable_wer_stats,
    alignment,
    count_ops,
    op_table,
    wer_details_for_batch,
    wer_summary,
)


def test_perfect_match():
    stats = accumulatable_wer_stats([[1, 2, 3]], [[1, 2, 3]])
    assert stats["WER"] == 0.0
    assert stats["num_edits"] == 0


def test_substitution():
    table = op_table("abc", "abd")
    ops = count_ops(table)
    assert ops["substitutions"] == 1
    assert ops["insertions"] == 0
    assert ops["deletions"] == 0


def test_insertion_deletion():
    assert count_ops(op_table("ab", "axb"))["insertions"] == 1
    assert count_ops(op_table("axb", "ab"))["deletions"] == 1


def test_empty_hyp():
    stats = accumulatable_wer_stats([[1, 2, 3]], [[]])
    assert stats["WER"] == 100.0
    assert stats["deletions"] == 3


def test_accumulation():
    s = accumulatable_wer_stats([[1, 2, 3]], [[1, 2, 4]])
    s = accumulatable_wer_stats([[1, 2]], [[1, 2]], s)
    assert s["num_ref_tokens"] == 5
    assert s["num_edits"] == 1
    assert abs(s["WER"] - 20.0) < 1e-9


def test_alignment_structure():
    table = op_table("abc", "axbc")
    steps = alignment(table)
    ops = [s[0] for s in steps]
    assert ops.count("I") == 1
    assert ops.count("=") == 3


def test_details_and_summary():
    details = wer_details_for_batch(
        ["u1", "u2"],
        [["a", "b"], ["c"]],
        [["a", "x"], ["c"]],
        compute_alignments=True,
    )
    assert details[0]["WER"] == 50.0
    assert details[1]["WER"] == 0.0
    summary = wer_summary(details)
    assert summary["num_scored_sents"] == 2
    assert abs(summary["WER"] - 100.0 / 3.0) < 1e-9
    assert summary["SER"] == 50.0
