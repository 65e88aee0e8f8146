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
