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
from alphazero_gomoku_tpu.search.tree import (advance_root,
                                              run_mcts_with_tree)
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


class _BoardView:
    """Minimal state shim for the pure-MCTS tactical scans."""

    def __init__(self, board: np.ndarray, captures=None):
        self.board = board
        self.size = board.shape[0]
        if captures is not None:
            self.captures = {1: captures[0], 2: captures[1]}


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
        tactical_guard: bool = True,
        tree_reuse: bool = True,
        search: str = "puct",   # "gumbel": sequential halving
                                # (search/gumbel.py) — play argmax of the
                                # improved policy; disables tree reuse
        gumbel_parallel: bool = True,  # gumbel only: batch each halving
                                # round's sims into ONE forward — at the
                                # player's batch of 1 this cuts network
                                # calls per move ~4x (m=16 @ 64 sims:
                                # 64 -> 15) and is serial-exact outside
                                # the endgame duplicate-candidate case
    ):
        self.rules = str(rules).lower()
        self.board_size = board_size
        self.n_simulations = n_simulations
        self.c_puct = c_puct
        self.model_path = model_path
        #: exact one-ply tactics pin (win now / block the opponent's win
        #: now) computed by the native winning-cell scan before searching.
        #: Conscious delta vs the reference player trio: a value head that
        #: is confidently lost flattens PUCT visit counts (every visited
        #: action backs up Q ~ -1 while unvisited ones keep Q = 0), and the
        #: argmax move degenerates exactly when one forced block would
        #: save the game — measured in round-2 tournaments. The guard
        #: never fires outside exact mate-in-one situations.
        self.tactical_guard = bool(tactical_guard)

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
        if model_path and os.path.exists(model_path) and not explicit:
            # the shipped default resolved: only use it when it matches the
            # requested board (a 9x9 probe player must not die on the
            # 15x15 default; explicit paths still fail loudly on mismatch)
            from alphazero_gomoku_tpu.models.checkpoint import peek_metadata
            try:
                ck_size = peek_metadata(model_path).get("board_size")
            except Exception:
                ck_size = None
            if ck_size is not None and ck_size != board_size:
                print(f"[AlphaZeroPlayer] default checkpoint {model_path} "
                      f"is {ck_size}x{ck_size}, not {board_size}x"
                      f"{board_size}; using fresh weights")
                model_path = None
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

        # fpu_mode="parent": engine-play search quality fix (see
        # MCTSConfig.fpu_mode) — self-play/training keep the
        # reference-exact "zero".  tree_reuse carries the search tree
        # across the player's own moves AND through the opponent's reply
        # (detected by board diff), mirroring the reference trio's
        # state-keyed node carry-over (~45% of expansions recur,
        # tools/tt_rate_probe.py); noise stays off, so reuse only adds
        # information.
        self.search = str(search)
        if self.search == "gumbel":
            tree_reuse = False   # not supported with gumbel yet
        self.tree_reuse = bool(tree_reuse)
        cfg = MCTSConfig(n_simulations=n_simulations, cpuct=c_puct,
                         add_noise=False, fpu_mode="parent",
                         search=self.search,
                         gumbel_round_parallel=(bool(gumbel_parallel)
                                                and self.search == "gumbel"),
                         reuse_budget=n_simulations if tree_reuse else 0)
        eval_fn = make_eval_fn(self.net.cfg)
        env = self.env
        self._trees = None
        self._board_after_our_move: Optional[np.ndarray] = None
        self._search = jax.jit(
            lambda bundle, state, move_no, key: run_mcts(
                env, cfg, eval_fn, bundle,
                jax.tree_util.tree_map(lambda x: x[None], state),
                jnp.asarray([move_no], jnp.int32), key,
            )[0]
        )
        if self.tree_reuse:
            def _fresh(bundle, state, move_no, key):
                pi, _, trees = run_mcts_with_tree(
                    env, cfg, eval_fn, bundle, jnp.asarray([move_no],
                                                           jnp.int32),
                    key, root_states=jax.tree_util.tree_map(
                        lambda x: x[None], state))
                return pi[0], trees

            def _resume(bundle, trees, move_no, key):
                pi, _, trees = run_mcts_with_tree(
                    env, cfg, eval_fn, bundle,
                    jnp.asarray([move_no], jnp.int32), key, trees=trees)
                return pi[0], trees

            self._search_fresh = jax.jit(_fresh)
            self._search_resume = jax.jit(_resume)
            self._advance = jax.jit(
                lambda trees, action: advance_root(
                    env, cfg, trees, jnp.asarray([action], jnp.int32)))
            self._step1 = jax.jit(env.step)

    # ------------------------------------------------------------------
    def _resume_trees_from_board(self, raw: np.ndarray, to_move: int):
        """Advance the held tree through the opponent's reply, if the
        board diff since our last move identifies it unambiguously
        (exactly one added opponent stone; removed cells are ours —
        Pente captures).  Returns advanced trees or None (fresh search)."""
        prev = self._board_after_our_move
        if self._trees is None or prev is None or prev.shape != raw.shape:
            return None
        pf, cf = prev.reshape(-1), raw.reshape(-1)
        added = np.flatnonzero((pf == 0) & (cf != 0))
        removed = np.flatnonzero((pf != 0) & (cf == 0))
        changed = np.flatnonzero((pf != cf) & (pf != 0) & (cf != 0))
        opp = 3 - to_move
        if (len(added) != 1 or cf[added[0]] != opp or len(changed)
                or (len(removed) and self.rules != "pente")
                or any(pf[i] == opp for i in removed)):
            return None
        return self._advance(self._trees, int(added[0]))

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
        trees = (self._resume_trees_from_board(raw, to_move)
                 if self.tree_reuse else None)
        action = None
        if self.tactical_guard:
            from alphazero_gomoku_tpu.search.pure_mcts import winning_cells

            view = _BoardView(
                raw, caps if self.rules == "pente" else None)
            mine = winning_cells(view, to_move)
            if mine.any():
                action = int(np.flatnonzero(mine)[0])
            else:
                theirs = winning_cells(view, 3 - to_move)
                if theirs.any():
                    # block (one of) the opponent's immediate wins; with
                    # two or more disjoint wins it is lost either way
                    action = int(np.flatnonzero(theirs)[0])
        if action is None:
            if self.tree_reuse:
                key = jax.random.PRNGKey(turn_number)
                if trees is not None:
                    pi, trees = self._search_resume(
                        bundle_of(self.net), trees, int(turn_number), key)
                else:
                    pi, trees = self._search_fresh(
                        bundle_of(self.net), state, int(turn_number), key)
                pi = np.asarray(pi)
            else:
                pi = np.asarray(
                    self._search(bundle_of(self.net), state,
                                 int(turn_number),
                                 jax.random.PRNGKey(turn_number))
                )
            action = int(np.argmax(pi))
        if self.tree_reuse:
            # carry the tree through OUR move (guard moves may hit an
            # unexpanded edge — advance_root falls back to a fresh root)
            self._trees = (self._advance(trees, action)
                           if trees is not None else None)
            self._board_after_our_move = np.asarray(
                self._step1(state, jnp.int32(action)).board, dtype=np.int8)
        return divmod(action, self.board_size)
