"""Reference-scale multijoin evidence: the 6 canonical confs at the
reference's own 16M-build ⋈ 256M-probe workload
(mc/wisconsin-src/datagen/generate.sh semantics — genbuild.py writes
R_16M_PK, genprobe.py S_256M_FK; our confs carry the same sizes and the
driver generates on device) on the real TPU chip.

Round-5 evidence protocol (VERDICT r4 next-step #5): each conf runs
1 compile rep + ``--reps`` WARM reps in one process; the reported phase
times are MEDIANS over the warm reps and every warm rep's raw timings are
kept in the line (single provenance, the reference's 5-repetition
runner.sh:3-41 discipline).  Writes one JSON line per conf to --out.
"""

import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import argparse
import json
import os
from statistics import median

from htm_hashjoin_tpu.wisconsin.conf import parse_conf
from htm_hashjoin_tpu.wisconsin.driver import run_multijoin

CONFS = ("no_partition", "independent", "parallel", "radix1", "steal",
         "flatmem")
PHASES = ("generateTimeNs", "splitBuildTimeNs", "splitProbeTimeNs",
          "buildTimeNs", "probeTimeNs", "totalJoinTimeNs")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out",
                   default="experiments/results_tpu27r5/"
                           "multijoin_fullscale_log")
    p.add_argument("--reps", type=int, default=5,
                   help="WARM repetitions (one extra compile rep runs "
                        "first)")
    p.add_argument("--confs", nargs="*", default=list(CONFS))
    a = p.parse_args()
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    lines = []
    for name in a.confs:
        conf = parse_conf(f"htm_hashjoin_tpu/wisconsin/conf/{name}.conf")
        res = None
        warm = []
        for rep in range(a.reps + 1):
            # free the previous output table BEFORE the next run: a held
            # 2 GB result while the next conf computes is the difference
            # between fitting and ResourceExhausted on the 15.75 GB chip
            del res
            res = None
            res = run_multijoin(conf)
            if rep > 0:                      # rep 0 pays compiles
                warm.append(json.loads(res.to_json_line()))
        line = dict(warm[-1])
        for ph in PHASES:
            line[ph] = int(median(w[ph] for w in warm))
        line["conf"] = name
        line["scale"] = "reference (16M build x 256M probe)"
        line["rep"] = (f"median of {a.reps} warm reps "
                       "(one compile rep excluded)")
        line["warmReps"] = [{ph: w[ph] for ph in PHASES} for w in warm]
        probe_s = line["probeTimeNs"] / 1e9
        line["probeMtuplesPerSec"] = round(
            line["probeRows"] / probe_s / 1e6, 1) if probe_s else None
        print(json.dumps(line), flush=True)
        assert line["outputRows"] == conf["probe"]["relation-size"], (
            name, line)
        lines.append(line)
    with open(a.out, "w") as f:
        for line in lines:
            f.write(json.dumps(line) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
