"""SFT pair extraction from multi-turn transcripts (operators/sessionize.sft_pairs)."""

def test_sft_pairs_extraction_and_history(spark):
    from chronon_spark.operators.sessionize import sft_pairs

    rows = [
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "hello"),
        ("c1", 2, "user", "how are you"),
        ("c1", 3, "assistant", "fine"),
        ("c1", 4, "assistant", "still here"),   # prev is assistant -> no pair
        ("c2", 0, "assistant", "cold open"),    # no preceding user -> no pair
        ("c2", 1, "user", "q"),
        ("c2", 2, "assistant", "a"),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = {(r["conv_id"], r["turn_idx"]): r for r in sft_pairs(t, max_history=3).collect()}
    assert set(got) == {("c1", 1), ("c1", 3), ("c2", 2)}
    assert got[("c1", 1)]["prompt"] == "user: hi"
    assert got[("c1", 1)]["response"] == "hello"
    assert got[("c1", 3)]["prompt"] == "user: hi\nassistant: hello\nuser: how are you"
    assert got[("c1", 3)]["n_history"] == 3
    # history packs preceding turns regardless of role
    assert got[("c2", 2)]["prompt"] == "assistant: cold open\nuser: q"
    assert got[("c2", 2)]["n_history"] == 2
    # max_history=0 -> only the immediately preceding user turn
    got0 = {(r["conv_id"], r["turn_idx"]): r["prompt"] for r in sft_pairs(t).collect()}
    assert got0[("c1", 3)] == "user: how are you"
