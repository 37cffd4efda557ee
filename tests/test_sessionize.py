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


def test_sft_pairs_random_differential(spark):
    import random

    from chronon_spark.operators.sessionize import sft_pairs

    for seed in (0, 1):
        rng = random.Random(seed)
        rows = []
        for c in range(8):
            n = rng.randint(0, 12)
            for t in range(n):
                rows.append((f"c{c}", t, rng.choice(["user", "assistant", "tool"]),
                             f"msg {c} {t} {rng.randint(0, 9)}"))
        h = rng.randint(0, 4)
        docs = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
        got = {
            (r["conv_id"], r["turn_idx"]): (r["prompt"], r["response"], r["n_history"])
            for r in sft_pairs(docs, max_history=h).collect()
        }
        # naive oracle
        byconv = {}
        for conv, t, role, text in rows:
            byconv.setdefault(conv, []).append((t, role, text))
        expect = {}
        for conv, turns in byconv.items():
            turns.sort()
            for i, (t, role, text) in enumerate(turns):
                if role != "assistant" or i == 0 or turns[i - 1][1] != "user":
                    continue
                lo = max(0, i - max(h, 1))
                hist = turns[lo:i]
                prompt = "\n".join(f"{r}: {x}" for _, r, x in hist)
                expect[(conv, t)] = (prompt, text, len(hist))
        assert got == expect, seed
