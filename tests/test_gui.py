"""GUI tests: headless rendering + mirror-mode file IPC protocol."""

import os
import threading
import time

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
os.environ.setdefault("SDL_AUDIODRIVER", "dummy")

from alphazero_gomoku_tpu.gui.mirror_ipc import (
    MoveLogTailer,
    MoveLogWriter,
    parse_move_line,
)


def test_move_log_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    w = MoveLogWriter("mirror_log.txt")
    t = MoveLogTailer("mirror_log.txt")
    assert t.poll() == []
    w.append((7, 7))
    w.append((0, 14))
    assert t.poll() == [(7, 7), (0, 14)]
    assert t.poll() == []  # no re-reads
    w.append((3, 3))
    assert t.poll() == [(3, 3)]


def test_parse_move_line_tolerates_garbage():
    assert parse_move_line("4,5\n") == (4, 5)
    assert parse_move_line("garbage\n") is None
    assert parse_move_line("") is None
    assert parse_move_line("1,2,3\n") is None


def test_tailer_skips_partial_lines(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with open("log.txt", "w") as f:
        f.write("1,2\n3,")  # second line incomplete
    t = MoveLogTailer("log.txt")
    assert t.poll() == [(1, 2)]
    with open("log.txt", "a") as f:
        f.write("4\n")
    assert t.poll() == [(3, 4)]


def test_headless_board_rendering(tmp_path, monkeypatch):
    pygame = pytest.importorskip("pygame")
    monkeypatch.chdir(tmp_path)
    from alphazero_gomoku_tpu.games.host import Gomoku
    from alphazero_gomoku_tpu.gui.interface import (
        App, board_pixel_size, draw_board, to_board_coords,
    )

    pygame.init()
    size = 9
    px = board_pixel_size(size)
    surf = pygame.display.set_mode((px, px + 120))
    font = pygame.font.SysFont(None, 24)
    g = Gomoku(size)
    g.do_move((4, 4))
    g.do_move((4, 5))
    draw_board(surf, g, font)
    # stone colours present at their centers
    from alphazero_gomoku_tpu.gui.interface import CELL, MARGIN
    c1 = surf.get_at((MARGIN + 4 * CELL, MARGIN + 4 * CELL))[:3]
    c2 = surf.get_at((MARGIN + 5 * CELL, MARGIN + 4 * CELL))[:3]
    assert c1 == (200, 30, 30) and c2 == (30, 60, 200)

    # click mapping: exact centre and out-of-grid
    assert to_board_coords((MARGIN + 3 * CELL, MARGIN + 2 * CELL), size) == (2, 3)
    assert to_board_coords((1, 1), size) is None

    # replay scrubber rebuilds an earlier position
    draw_board(surf, g, font, shown_history=1)
    c2_replayed = surf.get_at((MARGIN + 5 * CELL, MARGIN + 4 * CELL))[:3]
    assert c2_replayed != (30, 60, 200)  # second stone absent at ply 1
    pygame.quit()


def test_onscreen_replay_buttons(tmp_path, monkeypatch):
    """Clicking the panel "<" / ">" / "live" buttons scrubs the replay
    (reference interface.py:317-324 parity: on-screen controls, not just
    arrow keys)."""
    pygame = pytest.importorskip("pygame")
    monkeypatch.chdir(tmp_path)
    from alphazero_gomoku_tpu.gui.interface import App

    pygame.init()
    app = App(size=9)
    app.game_name = "gomoku"
    app.selected = {1: "human", 2: "human"}
    app.start_game()
    for mv in [(4, 4), (4, 5), (5, 5)]:
        app.game.do_move(mv)

    back, fwd, live = app._replay_buttons()
    assert app.replay_pos is None
    app._click(back.rect.center)
    assert app.replay_pos == 2
    app._click(back.rect.center)
    assert app.replay_pos == 1
    app._click(fwd.rect.center)
    assert app.replay_pos == 2
    app._click(fwd.rect.center)      # stepping past the head goes live
    assert app.replay_pos is None
    app._click(back.rect.center)
    app._click(live.rect.center)
    assert app.replay_pos is None
    # a replay-button click must never place a stone or trigger a rematch
    assert len(app.game.move_history) == 3
    pygame.quit()


def test_engine_bot_vs_bot_with_mirror_logs(tmp_path, monkeypatch):
    """Engine writes every accepted move to mirror_log.txt (no subprocess)."""
    monkeypatch.chdir(tmp_path)
    from alphazero_gomoku_tpu.gui.engine import run_engine

    run_engine("gomoku", size=7, p1="player_mcts", p2="player_mcts",
               spawn_mirror=False, max_moves=6)
    lines = open("mirror_log.txt").read().strip().splitlines()
    assert len(lines) == 6
    moves = [tuple(map(int, ln.split(","))) for ln in lines]
    assert len(set(moves)) == 6  # all distinct squares


def test_engine_accepts_human_click_via_input_log(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from alphazero_gomoku_tpu.gui.engine import run_engine

    def feed_clicks():
        time.sleep(0.3)
        with open("input_log.txt", "a") as f:
            f.write("3,3\n")

    t = threading.Thread(target=feed_clicks)
    t.start()
    run_engine("gomoku", size=7, p1="human", p2="player_mcts",
               spawn_mirror=False, max_moves=2)
    t.join()
    lines = open("mirror_log.txt").read().strip().splitlines()
    assert lines[0] == "3,3"  # the human's click became move 1
