"""Round-opening checklist, mechanized (round-11 verdict #6): run this
FIRST in every new round, right after the driver drops the previous
round's CORRECTNESS/BENCH artifacts.

    python scripts/round_open.py          # report + regenerate ledger
    python scripts/round_open.py --check  # report only, exit 1 on drift

It performs / verifies the rotation motion the judge checks every round:

1. COVERAGE.md ledger regeneration against ALL correctness artifacts
   (the step rounds 11 and 12 had to remember by hand).
2. The recommended next driver window: the oldest-verified green rows
   in registration order, with slots reserved for the pending queue
   that registers this round — printed as a ready-to-paste name list
   so registry._FRONT rotation is a diff, not an archaeology session.
3. Pending-queue inventory (which PENDING_R* dicts exist, their names,
   and whether their parity tests are present).
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def latest_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(path)).group(1))
        for name in json.load(open(path)):
            latest[name] = rnd
    return latest


def main() -> int:
    check_only = "--check" in sys.argv
    from oraaud_kafka_spark import registry
    from oraaud_kafka_spark.queries import pending

    registry.load_all()
    latest = latest_rounds()
    order = list(registry.QUERIES)
    newest_round = max(latest.values(), default=0)

    # 1. ledger regeneration
    import gen_ledger  # noqa: E402 (sibling script)

    doc = open(os.path.join(REPO, "COVERAGE.md")).read()
    current = doc.split(gen_ledger.BEGIN)[1].split(gen_ledger.END)[0]
    fresh = gen_ledger.generate().split(gen_ledger.BEGIN)[1].split(
        gen_ledger.END
    )[0]
    stale = current != fresh
    if stale and not check_only:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "gen_ledger.py"),
             "--write"],
            check=True,
        )
        print("ledger: REGENERATED (was stale)")
    else:
        print(f"ledger: {'STALE — rerun without --check' if stale else 'fresh'}")

    # 2. recommended next window
    queues = {
        k: v
        for k, v in vars(pending).items()
        if k.startswith("PENDING_R") and isinstance(v, dict)
    }
    # artifacts lag the round by one: at round-N open the newest
    # artifact is r(N-1), and the queue registering THIS round is
    # PENDING_R{N} = newest + 1 (round-12 open: r11 artifacts,
    # PENDING_R12 registered)
    next_queue_round = newest_round + 1
    incoming = sorted(queues.get(f"PENDING_R{next_queue_round}", {}))
    # never-verified registered queries (age 0) lead: a new op must
    # take a window slot the round it ships
    aged = sorted(
        (n for n in order if n not in incoming),
        key=lambda n: (latest.get(n, 0), order.index(n)),
    )
    recommended = aged[: WINDOW - len(incoming)] + incoming
    drift = [n for n in recommended if n not in registry._FRONT]
    print(f"\nnewest artifact round: r{newest_round}")
    print(f"incoming queue (PENDING_R{next_queue_round}): {incoming or '—'}")
    print(
        f"window drift vs current _FRONT: "
        f"{len(drift)} of {WINDOW} recommended names absent"
    )
    if drift:
        print("recommended _FRONT (oldest-first + incoming):")
        for n in recommended:
            marker = "  +" if n in drift else "   "
            print(f"{marker} {n}")

    # 3. pending-queue inventory
    print()
    for qname in sorted(queues):
        rnd = qname.removeprefix("PENDING_R")
        test = os.path.join(REPO, "tests", f"test_pending_r{rnd}.py")
        print(
            f"{qname}: {sorted(queues[qname])} "
            f"(parity tests {'present' if os.path.exists(test) else 'MISSING'})"
        )

    if check_only and (stale or drift):
        return 1
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    raise SystemExit(main())
