import sys; sys.path.insert(0, "/root/repo")
import json
from htm_hashjoin_tpu.wisconsin.conf import parse_conf
from htm_hashjoin_tpu.wisconsin.driver import run_multijoin

SCALE = 16  # divide reference sizes by this (full output would ship ~6 GB
            # through the ~45 MB/s host<->TPU tunnel)
for name in ("no_partition", "independent", "parallel", "radix1", "steal",
             "flatmem"):
    conf = parse_conf(f"htm_hashjoin_tpu/wisconsin/conf/{name}.conf")
    for side in ("build", "probe"):
        conf[side]["relation-size"] //= SCALE
        conf[side]["alphabet-size"] = max(1, conf[side]["alphabet-size"] // SCALE)
    res = None
    for rep in range(2):          # rep 1 compiles; rep 2 is the warm number
        res = run_multijoin(conf)
    line = json.loads(res.to_json_line())
    line["conf"] = name
    line["scale"] = f"reference/{SCALE}"
    line["rep"] = "warm (2nd of 2; first rep compiles)"
    print(json.dumps(line), flush=True)
    assert line["outputRows"] == conf["probe"]["relation-size"], (name, line)
