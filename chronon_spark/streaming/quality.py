"""Streaming conversation quality: the transcript_quality battery as a
custom stateful Structured Streaming operator.

``transcript_quality`` (operators/sessionize.py) is a full-conversation
aggregate — its verdict can flip with every arriving turn — so the
streaming form keeps per-conversation state in ``applyInPandasWithState``
and re-emits the conversation's CURRENT row each micro-batch it is touched
(update semantics: latest row per conv_id wins downstream). After all
turns have arrived, the emitted row is IDENTICAL to the batch engine's —
the differential test feeds the same transcript through micro-batches and
compares final state against operators/sessionize.transcript_quality
column-for-column, fingerprint included.

State holds the conversation's turns (turn_idx, role, normalized text,
char count, flags) — bounded by conversation length, the inherent cost of
an exact full-conversation metric. Redelivered turns (at-least-once
sources) are identified by turn_idx and dropped: first arrival wins, the
same offset-identity rule the ingest dedup uses (streaming/ingest.py)."""

from __future__ import annotations

import hashlib
import math
import re
from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

def _round6(x: float) -> float:
    """HALF_UP at 6 decimals — Spark's F.round, NOT Python's banker's
    round (they differ at exact ties like 1/128 = 0.0078125)."""
    return math.floor(x * 1e6 + 0.5) / 1e6


#: ASCII \s only — matches Java's default \s so streaming normalization is
#: byte-identical with the batch engine's regexp_replace
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _normalize(text: str | None) -> str:
    return _WS.sub(" ", (text or "").strip().lower())


def streaming_transcript_quality(
    stream: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    params: dict | None = None,
) -> DataFrame:
    """Per-conversation quality state over a turn stream. Emits the batch
    schema plus ``n_dup_deliveries`` (redelivered turn_idx arrivals
    dropped by first-wins)."""
    from chronon_spark.operators.sessionize import TRANSCRIPT_QUALITY_PARAMS

    p = {**TRANSCRIPT_QUALITY_PARAMS, **(params or {})}
    markers = tuple(p["refusal_markers"])
    user_role, assistant_role = p["user_role"], p["assistant_role"]

    out_schema = (
        f"{conv_col} string, n_turns long, n_user_turns long, "
        "n_assistant_turns long, starts_with_user boolean, "
        "alternation_frac double, n_empty_turns long, dup_turn_frac double, "
        "refusal_frac double, mean_assistant_chars double, "
        "mean_user_chars double, conv_fingerprint string, "
        "n_rules_failed long, tq_keep boolean, n_dup_deliveries long"
    )
    state_schema = (
        "turn_idxs array<long>, roles array<string>, nts array<string>, "
        "chars array<long>, empties array<boolean>, refusals array<boolean>, "
        "n_dups long"
    )

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            t_idx, roles, nts, chars, empties, refusals, n_dups = state.get
            t_idx, roles, nts = list(t_idx), list(roles), list(nts)
            chars, empties, refusals = list(chars), list(empties), list(refusals)
        else:
            t_idx, roles, nts, chars, empties, refusals, n_dups = (
                [], [], [], [], [], [], 0,
            )
        seen = set(t_idx)
        for pdf in pdfs:
            for _, r in pdf.iterrows():
                ti = int(r[turn_col])
                if ti in seen:  # at-least-once redelivery: first wins
                    n_dups += 1
                    continue
                seen.add(ti)
                text = r[text_col]
                text = "" if text is None or (isinstance(text, float) and np.isnan(text)) else str(text)
                role = str(r[role_col])
                t_idx.append(ti)
                roles.append(role)
                nts.append(_normalize(text))
                chars.append(len(text))
                empties.append(text.strip() == "")
                lt = text.lower()
                refusals.append(
                    role == assistant_role and any(m in lt for m in markers)
                )
        if not t_idx:
            return
        state.update((t_idx, roles, nts, chars, empties, refusals, int(n_dups)))

        order = np.argsort(np.asarray(t_idx, dtype=np.int64), kind="stable")
        o_roles = [roles[i] for i in order]
        o_nts = [nts[i] for i in order]
        n = len(order)
        n_user = sum(1 for r in o_roles if r == user_role)
        n_assist = sum(1 for r in o_roles if r == assistant_role)
        starts = bool(t_idx[order[0]] == 0 and o_roles[0] == user_role)
        alts = sum(1 for a, b in zip(o_roles, o_roles[1:]) if a != b)
        alt_frac = alts / (n - 1) if n > 1 else 0.0
        n_empty = sum(empties)
        dup_frac = (n - len(set(o_nts))) / n if n else 0.0
        ref_frac = sum(refusals) / n_assist if n_assist else 0.0
        a_chars = sum(c for c, r in zip(chars, roles) if r == assistant_role)
        u_chars = sum(c for c, r in zip(chars, roles) if r == user_role)
        mean_a = a_chars / n_assist if n_assist else 0.0
        mean_u = u_chars / n_user if n_user else 0.0
        fp = hashlib.md5(
            "\x1e".join(f"{r}:{t}" for r, t in zip(o_roles, o_nts)).encode()
        ).hexdigest()
        rules = [
            n >= p["min_turns"],
            n <= p["max_turns"],
            n_user > 0,
            n_assist > 0,
            starts if p["require_user_start"] else True,
            alt_frac >= p["min_alternation_frac"],
            n_empty <= p["max_empty_turns"],
            dup_frac <= p["max_dup_turn_frac"],
            ref_frac <= p["max_refusal_frac"],
        ]
        n_failed = sum(1 for r in rules if not r)
        yield pd.DataFrame(
            {
                conv_col: [key[0]],
                "n_turns": [n],
                "n_user_turns": [n_user],
                "n_assistant_turns": [n_assist],
                "starts_with_user": [starts],
                "alternation_frac": [_round6(alt_frac)],
                "n_empty_turns": [n_empty],
                "dup_turn_frac": [_round6(dup_frac)],
                "refusal_frac": [_round6(ref_frac)],
                "mean_assistant_chars": [_round6(mean_a)],
                "mean_user_chars": [_round6(mean_u)],
                "conv_fingerprint": [fp],
                "n_rules_failed": [n_failed],
                "tq_keep": [n_failed == 0],
                "n_dup_deliveries": [int(n_dups)],
            }
        )

    return stream.groupBy(conv_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
