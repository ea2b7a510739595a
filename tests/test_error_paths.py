"""Failure-mode contracts: invalid inputs must fail loudly and precisely
(the reference mostly swallows errors — SURVEY §5 'failure detection';
this framework's contracts are pinned here instead)."""
import zlib

import numpy as np
import pytest

from yag_slam_tpu.core.config import make_config
from yag_slam_tpu.core.transform import Transform
from yag_slam_tpu.graphopt.spa import SPA2d
from yag_slam_tpu.io.simulator import SimWorld, simulate_scan
from yag_slam_tpu.matching.matcher import CorrelativeScanMatcher
from yag_slam_tpu.matching.pipeline import OnlineMatchPipeline
from yag_slam_tpu.slam.graph_slam import GraphSlam

CFG = {
    "range_threshold": 5.0,
    "resolution": 0.05,
    "search_size": 0.5,
    "smear_deviation": 0.05,
}


def _scan():
    world = SimWorld.office()
    return simulate_scan(world, np.zeros(3), n_beams=90, range_threshold=5.0)


def test_smear_deviation_validation():
    # the reference asserts 0.5*res <= smear <= 10*res
    # (/root/reference/yag_slam/helpers.py:370)
    with pytest.raises(Exception):
        make_config({"resolution": 0.05, "smear_deviation": 0.001})
    with pytest.raises(Exception):
        make_config({"resolution": 0.01, "smear_deviation": 0.5})
    make_config({"resolution": 0.05, "smear_deviation": 0.05})  # ok


def test_match_scan_empty_base():
    m = CorrelativeScanMatcher(CFG)
    with pytest.raises(ValueError):
        m.match_scan(_scan(), [], True, True)


def test_match_scan_sets_empty():
    m = CorrelativeScanMatcher(CFG)
    with pytest.raises(ValueError):
        m.match_scan_sets([], [_scan()])
    with pytest.raises(ValueError):
        m.match_scan_sets([_scan()], [])


def test_match_many_empty_is_trivial():
    m = CorrelativeScanMatcher(CFG)
    assert m.match_many([]) == []
    assert m.match_many_async([]).result() == []


def test_pipeline_push_before_seed():
    m = CorrelativeScanMatcher(CFG)
    pipe = OnlineMatchPipeline(m)
    with pytest.raises(RuntimeError):
        pipe.push(_scan())


def test_corrupt_checkpoint_rejected(tmp_path):
    with pytest.raises(zlib.error):
        GraphSlam.unbinarize(b"this is not a checkpoint")
    # truncated but valid-zlib-prefix garbage also fails loudly
    blob = zlib.compress(b"\x01\x02\x03junk")
    with pytest.raises(Exception):
        GraphSlam.unbinarize(blob)


def test_spa_duplicate_node_id():
    spa = SPA2d()
    spa.add_node(0.0, 0.0, 0.0, 7)
    with pytest.raises(ValueError):
        spa.add_node(1.0, 0.0, 0.0, 7)


def test_spa_constraint_unknown_node():
    spa = SPA2d()
    spa.add_node(0.0, 0.0, 0.0, 0)
    with pytest.raises(KeyError):
        spa.add_constraint(0, 99, 1.0, 0.0, 0.0, np.eye(3).tolist())
