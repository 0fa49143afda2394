"""Shared implementation for the AlphaZero checkpoint players.

Equivalent of the reference's near-identical ``player.py`` /
``player_alpha.py`` / ``player_alpha2.py`` trio (SURVEY.md §2 A1): wrap the
network + MCTS behind the ``play()`` protocol, loading a snapshot checkpoint
and searching with noise off / deterministic argmax.  The variants only
change defaults (simulation count, snapshot path).

TPU-native internals: the game is rebuilt on device via ``env.from_board``
and a single jitted ``run_mcts`` call produces the move — no per-simulation
host work.  Robustness delta vs the reference: the side to move is inferred
from the stone counts on the board rather than from turn parity
(``players/player.py:68`` mislabels it after opening moves; with the
perspective-invariant encoding both give identical play, but counting is
always consistent).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_gomoku_tpu.games import make_env
from alphazero_gomoku_tpu.models import AZModel
from alphazero_gomoku_tpu.search import MCTSConfig, run_mcts
from alphazero_gomoku_tpu.selfplay.loop import bundle_of, make_eval_fn


def infer_to_move(board: np.ndarray, captures=(0, 0)) -> int:
    """Exact side-to-move from stones + captured-pair counts.

    Each move adds one stone of the mover; each captured pair removes two
    OPPONENT stones, so ``moves_by_p = stones_of_p + 2 * pairs_captured_BY_
    opponent``.  P1 moved first, hence P1 is to move iff the move counts are
    equal.  (Turn-number parity is unreliable: the reference's callers
    disagree on the convention — ``play.py`` pre-increments to 1, the
    tournament runner doesn't count its random opening, the GUI passes
    moves-played.)
    """
    stones1 = int((board == 1).sum())
    stones2 = int((board == 2).sum())
    moves1 = stones1 + 2 * int(captures[1])
    moves2 = stones2 + 2 * int(captures[0])
    return 1 if moves1 == moves2 else 2


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


#: constructor default shared by every shipped player variant; any other
#: value counts as an explicitly requested checkpoint
DEFAULT_MODEL_PATH = "models/best_latest.ckpt"


def _resolve_checkpoint(path: Optional[str], rules: str,
                        allow_default: bool = True) -> Optional[str]:
    """Find a usable snapshot: the given path as-is, then repo-relative,
    then (``allow_default``) the shipped default in ``checkpoints/``
    (cwd-independent, so the GUI and CLIs work from anywhere)."""
    if path and os.path.exists(path):
        return path
    candidates = []
    if path:
        candidates.append(os.path.join(_REPO_ROOT, path))
    if allow_default:
        candidates.append(os.path.join(_REPO_ROOT, "checkpoints",
                                       f"best_{rules}.ckpt"))
    for c in candidates:
        if os.path.exists(c):
            return c
    return path


class AlphaZeroPlayer:
    def __init__(
        self,
        rules: str = "gomoku",
        board_size: int = 15,
        n_simulations: int = 3000,
        c_puct: float = 1.0,
        model_path: Optional[str] = "models/best_latest.ckpt",
        n_res_blocks: int = 3,
        channels: int = 64,
    ):
        self.rules = str(rules).lower()
        self.board_size = board_size
        self.n_simulations = n_simulations
        self.c_puct = c_puct
        self.model_path = model_path

        self.env = make_env(self.rules, board_size)
        explicit = model_path not in (None, DEFAULT_MODEL_PATH)
        model_path = _resolve_checkpoint(model_path, self.rules,
                                         allow_default=not explicit)
        if explicit and not (model_path and os.path.exists(model_path)):
            # never silently substitute another net for a checkpoint the
            # caller asked for by name (a typo'd --p1-model must not load
            # the shipped default or random weights)
            raise FileNotFoundError(
                f"AlphaZero player: requested checkpoint {model_path!r} "
                "does not exist")
        if model_path and os.path.exists(model_path):
            print(f"[AlphaZeroPlayer] loading model: {model_path}")
            # size the net from the checkpoint's own metadata so plugins
            # load 6x128 (or any) snapshots without architecture flags
            self.net = AZModel.from_checkpoint(model_path,
                                               board_size=board_size)
        else:
            print(f"[AlphaZeroPlayer] WARNING: no model at {model_path!r}; "
                  "playing with random weights")
            self.net = AZModel(board_size=board_size,
                               n_res_blocks=n_res_blocks, channels=channels)
        if self.rules == "pente" and self.net.cfg.in_channels == 5:
            # checkpoint was trained with the captured-pair planes opt-in;
            # rebuild the env so encode() matches the net's input layout
            self.env = make_env(self.rules, board_size, capture_planes=True)

        cfg = MCTSConfig(n_simulations=n_simulations, cpuct=c_puct,
                         add_noise=False)
        eval_fn = make_eval_fn(self.net.cfg)
        env = self.env
        self._search = jax.jit(
            lambda bundle, state, move_no, key: run_mcts(
                env, cfg, eval_fn, bundle,
                jax.tree_util.tree_map(lambda x: x[None], state),
                jnp.asarray([move_no], jnp.int32), key,
            )[0]
        )

    # ------------------------------------------------------------------
    def play(self, board, turn_number: int,
             last_opponent_move) -> Optional[Tuple[int, int]]:
        raw = np.asarray(board if isinstance(board, (list, np.ndarray))
                         else board.board, dtype=np.int8)
        caps = getattr(board, "captures", None)
        caps = (caps.get(1, 0), caps.get(2, 0)) if isinstance(caps, dict) \
            else (0, 0)
        to_move = infer_to_move(raw, caps)
        if self.rules == "pente":
            state = self.env.from_board(raw, to_move, captures=caps)
        else:
            state = self.env.from_board(raw, to_move)
        if bool(state.done):
            return None
        pi = np.asarray(
            self._search(bundle_of(self.net), state, int(turn_number),
                         jax.random.PRNGKey(turn_number))
        )
        action = int(np.argmax(pi))
        return divmod(action, self.board_size)
