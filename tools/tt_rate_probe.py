#!/usr/bin/env python
"""Measure transposition + cross-move reuse rates in real AlphaZero search.

Closes the round-1 review's open question on the transposition-table
delta: the reference keys MCTS node statistics by board state
(``/root/reference/mcts/new_mcts_alpha.py:60-64,190-197``) and never
clears the dicts within a game, so it gets (a) in-tree transposition
sharing and (b) cross-move tree reuse for free; the array-tree search
drops both (documented in ``search/tree.py`` header).  Whether that
costs strength-per-simulation depends on how OFTEN the two effects fire
in real Gomoku searches — which this probe measures directly:

  - ``tt_rate``: fraction of node expansions whose (board, to-move) state
    was already expanded elsewhere in the SAME move's tree.  This bounds
    the benefit of in-tree transposition sharing.
  - ``reuse_rate``: fraction of a move's expansions whose state already
    existed in the PREVIOUS move's tree (what cross-move reuse would have
    skipped — the reference's effective extra simulations per move).

Runs a plain object-tree PUCT search (reference semantics: W/(1+N),
illegal masked, first-max tie-break) with the SHIPPED checkpoint's real
policy on the host engine, self-playing one game with visit-count move
selection.  CPU-friendly at a few hundred sims.

Usage: python tools/tt_rate_probe.py [--sims 200] [--moves 24] [--size 15]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/best_gomoku.ckpt")
    ap.add_argument("--sims", type=int, default=200)
    ap.add_argument("--moves", type=int, default=24)
    ap.add_argument("--size", type=int, default=15)
    ap.add_argument("--cpuct", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    from alphazero_gomoku_tpu.games.host import Gomoku
    from alphazero_gomoku_tpu.models.model import AZModel
    from alphazero_gomoku_tpu.models.resnet import apply

    model = AZModel.from_checkpoint(args.ckpt)
    cfg = model.cfg

    @jax.jit
    def net(obs):
        (logits, value), _ = apply(cfg, model.params, model.batch_stats,
                                   obs, train=False)
        return jax.nn.softmax(logits, -1), value

    def evaluate(game):
        obs = game.get_encoded_state().transpose(1, 2, 0)[None]
        p, v = net(np.asarray(obs, np.float32))
        return np.asarray(p[0], np.float32), float(v[0, 0])

    def key_of(game):
        return game.board.tobytes() + bytes([game.current_player])

    class Node:
        __slots__ = ("n", "w", "p", "children", "legal")

        def __init__(self, priors, legal):
            a = priors.shape[0]
            self.n = np.zeros(a, np.float32)
            self.w = np.zeros(a, np.float32)
            self.p = priors
            self.legal = legal
            self.children = {}

    rng = np.random.default_rng(args.seed)
    game = Gomoku(args.size)
    # a couple of random opening plies for tree diversity
    for _ in range(2):
        moves = game.get_legal_moves()
        game.do_move(moves[rng.integers(len(moves))])

    tot_exp = 0          # total expansions
    tot_tt = 0           # expansions whose state already in THIS tree
    tot_reuse = 0        # expansions whose state was in the PREVIOUS tree
    prev_keys = set()

    for mv in range(args.moves):
        if game.check_winner() or not game.has_legal_moves():
            break
        legal = game.get_valid_moves().astype(np.float32)
        p, _ = evaluate(game)
        p = p * legal
        p /= max(p.sum(), 1e-9)
        root = Node(p, legal)
        keys = {key_of(game)}

        for _ in range(args.sims):
            g = game.clone()
            node = root
            path = []
            # select
            while True:
                sum_n = node.n.sum()
                q = node.w / (1.0 + node.n)
                u = args.cpuct * node.p * np.sqrt(sum_n) / (1.0 + node.n)
                scores = np.where(node.legal > 0, q + u, -1e9)
                a = int(np.argmax(scores))
                path.append((node, a))
                g.do_move(g.action_to_move(a))
                w = g.check_winner()
                if w or not g.has_legal_moves():
                    v = -1.0 if w else 0.0
                    break
                if a not in node.children:
                    # expansion
                    k = key_of(g)
                    tot_exp += 1
                    if k in keys:
                        tot_tt += 1
                    if k in prev_keys:
                        tot_reuse += 1
                    keys.add(k)
                    lg = g.get_valid_moves().astype(np.float32)
                    pr, v = evaluate(g)
                    pr = pr * lg
                    pr /= max(pr.sum(), 1e-9)
                    node.children[a] = Node(pr, lg)
                    break
                node = node.children[a]
            # backup with per-hop perspective flip
            for (nd, a) in reversed(path):
                v = -v
                nd.n[a] += 1
                nd.w[a] += v
        prev_keys = keys
        counts = root.n
        game.do_move(game.action_to_move(int(np.argmax(counts))))

    print(json.dumps({
        "sims": args.sims, "moves_played": mv + 1, "size": args.size,
        "expansions": tot_exp,
        "tt_rate": round(tot_tt / max(tot_exp, 1), 4),
        "reuse_rate": round(tot_reuse / max(tot_exp, 1), 4),
    }))


if __name__ == "__main__":
    import sys
    sys.exit(main())
