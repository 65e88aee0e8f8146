"""CLI flag surface — main.cpp:43-71 flags plus the mc getopt_long
compatibility group (mc/src/main.c:492-608)."""

import json

from htm_hashjoin_tpu.cli import main, parse_args
from htm_hashjoin_tpu.config import Algo, Distribution


def test_mc_algo_aliases():
    cfg, _ = parse_args(["--algo", "PRO"])
    assert cfg.algo == Algo.RADIX
    cfg, _ = parse_args(["--algo", "NPO_st"])
    assert cfg.algo == Algo.NPO_ST


def test_mc_flag_mapping_defaults_pk_fk():
    """mc-style invocation: R defaults to pk, S to fk (mc/src/main.c:368-412),
    seeds map to --r-seed/--s-seed (defaults 12345/54321 there)."""
    cfg, _ = parse_args(["--algo", "NPO", "-r", "4096", "-s", "8192",
                         "-x", "12345", "-y", "54321", "-n", "8"])
    assert cfg.r_size == 4096 and cfg.s_size == 8192
    assert cfg.seed == 12345 and cfg.s_seed == 54321
    assert cfg.data_distr == Distribution.PK
    assert cfg.s_distr == Distribution.FK
    assert cfg.num_partitions >= 8


def test_mc_zipf_probe_side():
    cfg, _ = parse_args(["--algo", "PRO", "-r", "4096", "-s", "4096",
                         "-z", "1.05"])
    assert cfg.s_distr == Distribution.ZIPF and cfg.zipf_param == 1.05


def test_mc_nonunique_and_lshuffle():
    cfg, _ = parse_args(["--non-unique", "-r", "1024"])
    assert cfg.data_distr == Distribution.NONUNIQUE
    cfg, _ = parse_args(["-l", "64", "-r", "1024"])
    assert cfg.data_distr == Distribution.PK_LSHUFFLE
    assert cfg.shuffle_range == 64


def test_mc_invocation_end_to_end(capsys):
    """PK ⋈ FK through the mc surface: match count == s_size exactly
    (generator.c:458-491 multiplicity invariant)."""
    main(["--algo", "NPO", "-r", "1024", "-s", "2048"])
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["totalMatches"] == 2048
    assert d["inputSum"] == d["outputSum"]


def test_zipf_probe_end_to_end(capsys):
    """-z: zipf S over the PK alphabet still matches every probe tuple."""
    main(["--algo", "NPO", "-r", "1024", "-s", "1024", "-z", "0.9"])
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["totalMatches"] == 1024


def test_mc_zero_skew_is_fk():
    """mc treats skew == 0 as the uniform FK generator (main.c:403-411)."""
    cfg, _ = parse_args(["--algo", "PRO", "-r", "1024", "-s", "1024",
                         "-z", "0"])
    assert cfg.s_distr == Distribution.FK


def test_mc_nonunique_s_side():
    """--non-unique: S is also nonunique with maxid = r_size
    (mc/src/main.c:398-401)."""
    import numpy as np
    from htm_hashjoin_tpu.data.generators import build_relations
    cfg, _ = parse_args(["--non-unique", "-r", "1024", "-s", "2048"])
    assert cfg.s_distr == Distribution.NONUNIQUE
    r, s = build_relations(cfg)
    sk = np.asarray(s.keys)
    assert sk.max() <= 1024 and len(np.unique(sk)) < 2048


def test_mc_fullrange_fk_from_actual_r():
    """--full-range: R spans the full int range; S draws from R's ACTUAL
    keys (fk_from_pk over relR, main.c:393-395) so every S key matches."""
    import json
    cfg, _ = parse_args(["--full-range", "-r", "1024", "-s", "2048"])
    assert cfg.data_distr == Distribution.NONUNIQUE
    assert cfg.distinct_keys == 2**31 - 2
    main(["--algo", "NPO", "--full-range", "-r", "1024", "-s", "2048"])


def test_mc_nthreads_alone_triggers_mc_defaults():
    cfg, _ = parse_args(["--algo", "PRO", "-n", "4"])
    assert cfg.data_distr == Distribution.PK
    assert cfg.s_distr == Distribution.FK
