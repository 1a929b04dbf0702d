"""Top-2 "get-back" augmentation kernel (J3/D3/A5).

Reference: DataAugmentator._refine_predict / _get_back_from_top2
(/root/reference/data_process/dataAugmentator.py:100-146):

* every query is predicted with ``top_k = 2``; top-1 labels decode to typed
  spans (W1), top-2 (label, prob) sequences are kept per query;
* positions of *date-typed* top-1 spans (type ends with D/S/E) are looked up
  in every other query's top-2 sequence;
* a top-2 span is "gotten back" iff its label shape is ``B I ... I`` at the
  exact (start, end) positions AND three mean-probability gates all clear
  ``p_times * mean(all top-2 probs of that query)`` — start prob, interior
  mean, whole-span mean (dataAugmentator.py:126-139);
* faithful quirk: for single-token spans the interior slice is empty, its
  NumPy mean is NaN, and ``nan > threshold`` is False — single-token date
  positions are never gotten back.  Preserved deliberately;
* the emitted tuple reuses the ``pid`` slot for the ``ent_mean / mean``
  confidence ratio (dataAugmentator.py:141-145) — we emit that ratio as an
  explicit ``score_ratio`` column instead and keep doc identity separate.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from .iob2 import Span, decode_bio
from .scorer import ID2LABEL, DeterministicQAScorer
from .wordpiece import SEP, assemble, tokenize_text

Top2Row = Tuple[str, str, float, str, float]  # token, l1, p1, l2, p2


def predict_query_rows(
    scorer: DeterministicQAScorer,
    q_tag: str,
    query_tokens: Sequence[str],
    passage_tokens: Sequence[str],
    max_seq_length: int = 512,
    top_k: int = 2,
) -> List[Top2Row]:
    """predict_for_one_query with top_k=k: merged + stripped
    (token, label1, prob1, ..., labelk, probk) rows
    (bert_qasl_predictor.py:50-106).  k=2 is the augmentation path
    (dataAugmentator.py:100-111); k=3 is the demo path (demo/app.py)."""
    seq = assemble(query_tokens, passage_tokens, max_seq_length)
    idx, prob = scorer.predict_topk(q_tag, seq, top_k=top_k)

    results: List[Top2Row] = []
    for i, t in enumerate(seq):
        if "##" in t:
            head = results[-1]
            results[-1] = (head[0] + t[2:],) + head[1:]
            continue
        r: Tuple = (t,)
        for k in range(top_k):
            lp = ID2LABEL[int(idx[i, k])]
            lab = f"{lp}-{q_tag}" if lp != "O" else lp
            r += (lab, float(prob[i, k]))
        results.append(r)  # type: ignore[arg-type]
    first_sep = next(i for i, r in enumerate(results) if r[0] == SEP)
    return results[first_sep + 1 : -1]


def get_back_from_top2(
    res_top1: Sequence[Span],
    res_top2: Sequence[List[Tuple[str, float]]],
    label_map: Dict[int, str],
    p_times: float,
) -> List[Tuple[float, str, int, int, str]]:
    """dataAugmentator.py:113-146, returning
    (score_ratio, type, start_pos, end_pos, text)."""
    date_position: List[Tuple[int, int]] = []
    text_list: List[str] = []
    for a in sorted(res_top1, key=lambda x: x[2]):  # by start_pos
        if any(a[1].endswith(s) for s in ("D", "S", "E")):
            date_position.append((a[2], a[3]))
            text_list.append(a[4])

    pruned: List[Tuple[float, str, int, int, str]] = []
    for j, (start_pos, end_pos) in enumerate(date_position):
        for i, top2 in enumerate(res_top2):
            typ = label_map[i]
            if start_pos >= len(top2) or end_pos >= len(top2):
                continue  # span truncated away
            probs = np.array([t[1] for t in top2], dtype=np.float64)
            mean = float(probs.mean())
            thr = mean * p_times
            if top2[start_pos][0].startswith("B") and all(
                t[0].startswith("I") for t in top2[start_pos + 1 : end_pos + 1]
            ):
                interior = probs[start_pos + 1 : end_pos + 1]
                # faithful NaN quirk: empty interior -> NaN -> gate fails
                end_mean = float(interior.mean()) if interior.size else float("nan")
                if top2[start_pos][1] > thr and end_mean > thr:
                    ent_mean = float(probs[start_pos : end_pos + 1].mean())
                    if ent_mean > thr:
                        pruned.append(
                            (ent_mean / mean, typ, start_pos, end_pos, text_list[j])
                        )
    return pruned


def augment_doc(
    scorer: DeterministicQAScorer,
    queries: Dict[str, str],
    passage: str,
    pid: int,
    p_times: float = 1.3,
    max_seq_length: int = 512,
) -> Tuple[List[Span], List[Tuple[float, str, int, int, str]]]:
    """One document's (top-1 spans, gotten-back top-2 spans)."""
    passage_tokens = tokenize_text(passage)
    label_map = {i: tag for i, tag in enumerate(queries.keys())}
    res_top1: List[Span] = []
    res_top2: List[List[Tuple[str, float]]] = []
    for tag, q in queries.items():
        rows = predict_query_rows(
            scorer, tag, tokenize_text(q), passage_tokens, max_seq_length
        )
        seq_top1 = [(r[0], r[1]) for r in rows]
        res_top1.extend(
            decode_bio([t for t, _ in seq_top1], [l for _, l in seq_top1], pid=pid)
        )
        res_top2.append([(r[3], r[4]) for r in rows])
    pruned = get_back_from_top2(res_top1, res_top2, label_map, p_times)
    return res_top1, pruned
