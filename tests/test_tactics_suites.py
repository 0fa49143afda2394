"""Oracle validation of the curated tactics suites (tools/tactics_suites.py).

Every position's ``keys`` set is DERIVED from the host rules oracle
(win-in-one scans, forced-loss search), so a typo in a board or an
ill-posed threat fails here rather than silently skewing the probe
metrics in ``metrics/tactics_*.jsonl``.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from tactics_suites import (  # noqa: E402
    gomoku_suite,
    pente_suite,
    validate_position,
)

_CHEAP = ("win1", "win_priority", "block_win1")


def _split(suite):
    cheap = [p for p in suite if p.category in _CHEAP]
    deep = [p for p in suite if p.category not in _CHEAP]
    return cheap, deep


GOMOKU_CHEAP, GOMOKU_DEEP = _split(gomoku_suite())
PENTE_CHEAP, PENTE_DEEP = _split(pente_suite())


def test_suite_sizes():
    assert len(GOMOKU_CHEAP) + len(GOMOKU_DEEP) >= 20
    assert len(PENTE_CHEAP) + len(PENTE_DEEP) >= 20
    # every category is represented in both games
    for suite in (GOMOKU_CHEAP + GOMOKU_DEEP, PENTE_CHEAP + PENTE_DEEP):
        cats = {p.category for p in suite}
        assert {"win1", "win_priority", "block_win1", "block_open3",
                "make_open4"} <= cats


def test_gomoku_oracle_scan_categories():
    for pos in GOMOKU_CHEAP:
        validate_position(pos)


def test_pente_oracle_scan_categories():
    for pos in PENTE_CHEAP:
        validate_position(pos)


@pytest.mark.parametrize("pos", GOMOKU_DEEP + PENTE_DEEP,
                         ids=lambda p: p.name)
def test_forced_loss_categories(pos):
    """3-ply forced-loss derivations (block_open3 / make_open4)."""
    validate_position(pos)
