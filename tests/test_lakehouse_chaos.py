"""Chaos stress of the icetable optimistic-commit protocol under REAL
process concurrency and SIGKILL (VERDICT r4 ask #5).

Four writer processes race CAS commits on one table while the parent
SIGKILLs a random writer every few hundred ms and restarts it; a reader
process concurrently polls CURRENT the whole time.  Invariants asserted:

- **no lost update**: each writer stamps a per-writer monotone counter
  into every commit's lineage; the final lineage must contain each
  writer's sequence 1..count exactly once (a lost update would duplicate
  or skip a k — the precise failure the flock + CAS protocol prevents)
- **no duplicate / gapped seq**: the snapshot chain is 0..N contiguous
  with parent_seq == seq - 1
- **no wedge after SIGKILL**: a holder killed inside the critical
  section releases its flock with its fd (kernel guarantee), so the
  surviving writers keep committing — if the lock leaked, every later
  commit would TimeoutError and the final counts would stall
- **readers never see a torn manifest**: CURRENT is swapped with
  os.replace onto immutable snapshot files, so every concurrent read
  parses and seq never regresses

The protocol is metadata-only here on purpose: data-file crash safety is
invisibility-until-commit (covered in test_lakehouse.py); what SIGKILL
uniquely threatens is the commit lock and the pointer swap.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import random
import signal
import time

from ehr_ner_spark.io.icetable import CommitConflict, IceTable

N_WRITERS = 4
RUN_SEC = 8.0
KILL_EVERY_SEC = 0.4


def _writer(root: str, wid: int, stop_evt, report_dir: str) -> None:
    t = IceTable(root)
    while not stop_evt.is_set():
        prev = t.current_snapshot() or {"seq": -1, "stages": {}}
        stages = dict(prev.get("stages", {}))
        me = dict(stages.get(f"w{wid}", {}))
        k = int(me.get("count", 0)) + 1
        me["count"] = k
        stages[f"w{wid}"] = me
        snap = {
            "seq": prev["seq"] + 1,
            "parent_seq": prev["seq"],
            "stages": stages,
            "lineage": (prev.get("lineage") or []) + [{"w": wid, "k": k}],
        }
        try:
            t._commit(snap, expect_parent=prev["seq"])
        except CommitConflict:
            continue  # CAS race lost — re-read and retry
        # durable success report AFTER the commit: a SIGKILL between
        # commit and report UNDERcounts (table >= report), never over
        with open(os.path.join(report_dir, f"w{wid}"), "w") as f:
            f.write(str(k))


def _reader(root: str, stop_evt, err_path: str) -> None:
    t = IceTable(root)
    last_seq = -1
    try:
        while not stop_evt.is_set():
            snap = t.current_snapshot()  # json.load — raises if torn
            if snap is not None:
                if snap["seq"] < last_seq:
                    raise AssertionError(
                        f"seq regressed {last_seq} -> {snap['seq']}"
                    )
                if len(snap.get("lineage") or []) != snap["seq"] + 1:
                    raise AssertionError(
                        f"lineage len {len(snap['lineage'])} != "
                        f"seq+1 {snap['seq'] + 1}"
                    )
                last_seq = snap["seq"]
    except Exception as e:  # noqa: BLE001 — reported to the parent
        with open(err_path, "w") as f:
            f.write(repr(e))


def test_cas_commits_survive_sigkill_storm(tmp_path):
    root = str(tmp_path / "tbl")
    report_dir = str(tmp_path / "reports")
    os.makedirs(report_dir)
    err_path = str(tmp_path / "reader_err")
    IceTable(root)  # create dirs

    ctx = mp.get_context("fork")
    stop_evt = ctx.Event()

    def spawn(wid: int):
        p = ctx.Process(target=_writer, args=(root, wid, stop_evt, report_dir))
        p.start()
        return p

    writers = {wid: spawn(wid) for wid in range(N_WRITERS)}
    reader = ctx.Process(target=_reader, args=(root, stop_evt, err_path))
    reader.start()

    rng = random.Random(0xC4A05)
    t_end = time.time() + RUN_SEC
    n_kills = 0
    try:
        while time.time() < t_end:
            time.sleep(KILL_EVERY_SEC)
            wid = rng.randrange(N_WRITERS)
            victim = writers[wid]
            if victim.is_alive():
                os.kill(victim.pid, signal.SIGKILL)  # mid-anything, maybe in-lock
                victim.join(timeout=5)
                n_kills += 1
            writers[wid] = spawn(wid)  # replacement resumes from table state
    finally:
        stop_evt.set()
        for p in writers.values():
            p.join(timeout=30)
            if p.is_alive():
                p.terminate()
        reader.join(timeout=30)
        if reader.is_alive():
            reader.terminate()

    assert n_kills >= 10, f"storm too tame ({n_kills} kills) to mean anything"
    assert not os.path.exists(err_path), (
        "reader saw a torn/regressing manifest: " + open(err_path).read()
    )

    t = IceTable(root)
    snap = t.current_snapshot()
    assert snap is not None and snap["seq"] >= 20, (
        f"only {snap and snap['seq']} commits landed — writers wedged?"
    )

    # per-writer lost-update check: lineage carries k=1..count exactly once
    lineage = snap["lineage"]
    assert len(lineage) == snap["seq"] + 1
    for wid in range(N_WRITERS):
        ks = [e["k"] for e in lineage if e["w"] == wid]
        count = snap["stages"].get(f"w{wid}", {}).get("count", 0)
        assert ks == list(range(1, count + 1)), (
            f"w{wid}: lineage ks {ks[:10]}... vs count {count} — "
            "duplicate or skipped commit (lost update)"
        )
        # reported successes are a lower bound on what the table holds
        rp = os.path.join(report_dir, f"w{wid}")
        if os.path.exists(rp):
            assert int(open(rp).read()) <= count

    # snapshot chain is contiguous: every seq 0..N present, parents linked
    snaps = {}
    for name in t.list_snapshots():
        with open(os.path.join(root, "snapshots", name)) as f:
            s = json.load(f)
        snaps.setdefault(s["seq"], []).append(s)
    for seq in range(snap["seq"] + 1):
        assert seq in snaps, f"seq {seq} missing from the chain"
    # the COMMITTED snapshot at each seq has parent seq-1; losers of the
    # CAS race may have written same-seq files that never became CURRENT,
    # which is fine (orphans) — walk the chain from CURRENT instead
    cur = snap
    while cur["seq"] > 0:
        parents = [
            s for s in snaps[cur["seq"] - 1]
            if s["lineage"] == cur["lineage"][:-1]
        ]
        assert parents, f"no parent snapshot for seq {cur['seq']}"
        cur = parents[0]
