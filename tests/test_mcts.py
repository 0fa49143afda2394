"""MCTS tests: invariants + exact differential test vs a host oracle.

The oracle is a straightforward object-tree PUCT search with the same
semantics as the device code (immediate leaf evaluation, no transposition
table, float32 score math) so that with an integer-exact deterministic fake
network both searches must produce IDENTICAL visit counts.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alphazero_gomoku_tpu.games.gomoku import GomokuEnv
from alphazero_gomoku_tpu.games.host import Gomoku
from alphazero_gomoku_tpu.search import MCTSConfig, run_mcts

SIZE = 7
A = SIZE * SIZE


# ----------------------------------------------------------------------
# integer-exact fake network (identical math host/device)
# ----------------------------------------------------------------------
def fake_probs_np(stones: int) -> np.ndarray:
    a = np.arange(A, dtype=np.float32)
    raw = 1.0 + np.float32((7.0 * a + stones) % 11.0)
    return (raw / np.float32(raw.sum())).astype(np.float32)


def fake_value_np(stones: int) -> np.float32:
    return np.float32((((stones * 3) % 5) - 2) / 4.0)


def fake_eval_jax(params, obs):
    del params
    b = obs.shape[0]
    stones = jnp.sum(obs[..., 0], axis=(1, 2)) + jnp.sum(obs[..., 1], axis=(1, 2))
    a = jnp.arange(A, dtype=jnp.float32)[None, :]
    raw = 1.0 + jnp.mod(7.0 * a + stones[:, None], 11.0)
    probs = raw / jnp.sum(raw, axis=-1, keepdims=True)
    value = (jnp.mod(stones * 3.0, 5.0) - 2.0) / 4.0
    return probs, value.reshape(b, 1)


# ----------------------------------------------------------------------
# host oracle (float32 PUCT, no transpositions)
# ----------------------------------------------------------------------
class _Node:
    __slots__ = ("game", "prior", "visit", "w", "legal", "children")

    def __init__(self, game):
        self.game = game
        self.legal = game.get_valid_moves().astype(np.float32)
        stones = int((game.board != 0).sum())
        if game.is_game_over():
            self.prior = np.zeros(A, np.float32)
        else:
            # reference semantics: masked priors are NOT renormalized
            p = fake_probs_np(stones) * self.legal
            if p.sum(dtype=np.float32) < 1e-8:
                p = self.legal / np.float32(self.legal.sum())
            self.prior = p.astype(np.float32)
        self.visit = np.zeros(A, np.float32)
        self.w = np.zeros(A, np.float32)
        self.children = {}


def oracle_mcts(root_game, n_sims, cpuct):
    """Object-tree PUCT with device-matching semantics (float32 math)."""
    cpuct = np.float32(cpuct)
    root = _Node(root_game.clone())
    for _ in range(n_sims):
        node, path = root, []
        while True:
            if node.game.is_game_over():
                break
            n, w, p = node.visit, node.w, node.prior
            sqrt_sum = np.float32(np.sqrt(np.float32(n.sum(dtype=np.float32))))
            scores = w / (np.float32(1.0) + n) + cpuct * p * sqrt_sum / (np.float32(1.0) + n)
            scores = np.where(node.legal == 1.0, scores, np.float32(-1e9))
            a = int(np.argmax(scores))
            new = a not in node.children
            if new:
                g = node.game.clone()
                g.do_move(divmod(a, SIZE))
                node.children[a] = _Node(g)
            path.append((node, a))
            node = node.children[a]
            if new:
                break
        if node.game.is_game_over():
            v = np.float32(0.0 if node.game.get_winner() == 0 else -1.0)
        else:
            v = fake_value_np(int((node.game.board != 0).sum()))
        for parent, a in reversed(path):
            v = np.float32(-v)
            parent.w[a] += v
            parent.visit[a] += np.float32(1.0)
    total = root.visit.sum(dtype=np.float32)
    return (root.visit / total).astype(np.float32)


# ----------------------------------------------------------------------
# device-side runner
# ----------------------------------------------------------------------
def device_mcts(host_games, n_sims, cpuct=1.25, noise=False, move_numbers=None,
                seed=0, epsilon=0.25):
    env = GomokuEnv(SIZE)
    cfg = MCTSConfig(n_simulations=n_sims, cpuct=cpuct, add_noise=noise,
                     dirichlet_alpha=0.3, dirichlet_epsilon=epsilon,
                     dirichlet_moves=10)

    def to_state(g):
        return env.from_board(
            g.board, g.current_player, move_count=len(g.move_history)
        )

    states = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[to_state(g) for g in host_games]
    )
    moves = (
        jnp.asarray(move_numbers, jnp.int32)
        if move_numbers is not None
        else jnp.asarray([len(g.move_history) for g in host_games], jnp.int32)
    )
    run = jax.jit(
        lambda st, mv, key: run_mcts(env, cfg, fake_eval_jax, None, st, mv, key)
    )
    return np.asarray(run(states, moves, jax.random.PRNGKey(seed)))


def random_position(seed, n_moves):
    rng = np.random.default_rng(seed)
    g = Gomoku(SIZE)
    for _ in range(n_moves):
        if g.is_game_over():
            break
        legal = np.nonzero(g.get_valid_moves())[0]
        g.do_move(divmod(int(rng.choice(legal)), SIZE))
    return g


@pytest.mark.parametrize("n_sims", [8, 48])
def test_matches_oracle_exactly(n_sims):
    games = [random_position(s, m) for s, m in
             [(0, 0), (1, 3), (2, 8), (3, 15), (4, 24), (5, 5)]]
    got = device_mcts(games, n_sims, cpuct=1.25, noise=False)
    for i, g in enumerate(games):
        want = oracle_mcts(g, n_sims, 1.25)
        np.testing.assert_array_equal(
            got[i], want, err_msg=f"game {i} diverged from oracle"
        )


def oracle_mcts_kleaf(root_game, n_sims, k, cpuct):
    """Host oracle for the k-leaves-per-sim virtual-loss search.

    Mirrors tree._select_expand_vl/_finalize_leaf float-for-float: per
    macro step, k selects each applying N+1/W-1 (no perspective flip) on
    every traversed edge and giving fresh nodes uniform-over-legal
    placeholder priors; then k finalizes in order, each overwriting the
    leaf's priors with the real (masked, unrenormalized) policy and adding
    ``v_flipped + 1`` to W along its path.
    """
    cpuct = np.float32(cpuct)
    one = np.float32(1.0)
    root = _Node(root_game.clone())
    assert n_sims % k == 0
    for _ in range(n_sims // k):
        pending = []  # (leaf_node, path, is_new)
        for _j in range(k):
            node, path = root, []
            while True:
                if node.game.is_game_over():
                    break
                n, w, p = node.visit, node.w, node.prior
                sqrt_sum = np.float32(
                    np.sqrt(np.float32(n.sum(dtype=np.float32))))
                scores = w / (one + n) + cpuct * p * sqrt_sum / (one + n)
                scores = np.where(node.legal == 1.0, scores,
                                  np.float32(-1e9))
                a = int(np.argmax(scores))
                new = a not in node.children
                if new:
                    g = node.game.clone()
                    g.do_move(divmod(a, SIZE))
                    child = _Node(g)
                    # placeholder priors until the batched eval lands
                    n_legal = np.float32(max(child.legal.sum(), 1.0))
                    child.prior = (child.legal / n_legal).astype(np.float32)
                    node.children[a] = child
                path.append((node, a))
                node = node.children[a]
                if new:
                    break
            for parent, a in path:  # virtual loss, no flip
                parent.visit[a] += one
                parent.w[a] += np.float32(-1.0)
            pending.append((node, path))
        for node, path in pending:  # finalize in select order
            stones = int((node.game.board != 0).sum())
            if node.game.is_game_over():
                v = np.float32(
                    0.0 if node.game.get_winner() == 0 else -1.0)
            else:
                v = fake_value_np(stones)
                p = fake_probs_np(stones) * node.legal
                if p.sum(dtype=np.float32) < 1e-8:
                    p = node.legal / np.float32(node.legal.sum())
                node.prior = p.astype(np.float32)
            for parent, a in reversed(path):
                v = np.float32(-v)
                parent.w[a] += v + one
    total = root.visit.sum(dtype=np.float32)
    return (root.visit / total).astype(np.float32)


@pytest.mark.parametrize("k", [2, 4])
def test_kleaf_matches_oracle_exactly(k):
    games = [random_position(s, m) for s, m in
             [(0, 0), (2, 8), (3, 15), (5, 5)]]
    env = GomokuEnv(SIZE)
    cfg = MCTSConfig(n_simulations=32, cpuct=1.25, add_noise=False,
                     leaves_per_sim=k)

    def to_state(g):
        return env.from_board(
            g.board, g.current_player, move_count=len(g.move_history))

    states = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[to_state(g) for g in games])
    moves = jnp.asarray([len(g.move_history) for g in games], jnp.int32)
    run = jax.jit(
        lambda st, mv, key: run_mcts(env, cfg, fake_eval_jax, None, st,
                                     mv, key))
    got = np.asarray(run(states, moves, jax.random.PRNGKey(0)))
    for i, g in enumerate(games):
        want = oracle_mcts_kleaf(g, 32, k, 1.25)
        np.testing.assert_array_equal(
            got[i], want, err_msg=f"game {i} diverged from k-leaf oracle")


def test_kleaf_config_validation():
    with pytest.raises(ValueError):
        MCTSConfig(n_simulations=10, leaves_per_sim=4)  # not divisible
    with pytest.raises(ValueError):
        MCTSConfig(n_simulations=8, leaves_per_sim=0)


def test_kleaf_virtual_loss_fully_cancelled():
    """With a zero-value network and no reachable terminals, every W must
    return to EXACTLY zero after finalize — any residual means the virtual
    loss was not removed."""
    env = GomokuEnv(SIZE)
    cfg = MCTSConfig(n_simulations=24, cpuct=1.0, add_noise=False,
                     leaves_per_sim=4)

    def zero_eval(params, obs):
        del params
        b = obs.shape[0]
        probs = jnp.ones((b, A), jnp.float32) / A
        return probs, jnp.zeros((b, 1), jnp.float32)

    from alphazero_gomoku_tpu.search.tree import run_mcts_with_q
    states = env.init_batch(2)
    pi, q = jax.jit(
        lambda st, mv, key: run_mcts_with_q(env, cfg, zero_eval, None, st,
                                            mv, key)
    )(states, jnp.zeros((2,), jnp.int32), jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(q), 0.0)
    np.testing.assert_allclose(np.asarray(pi).sum(-1), 1.0, atol=1e-5)


def test_fpu_parent_keeps_search_on_priors_under_collapsed_value():
    """The round-2 engine pathology: a value head that scores everything
    ~-1 makes every VISITED action's Q ~ -1 while unvisited ones keep
    Q = 0 under the reference formula, so visits flatten over all legal
    moves.  fpu_mode='parent' must keep the search concentrated on the
    prior-preferred action instead."""
    env = GomokuEnv(SIZE)
    target = 3 * SIZE + 3

    def collapsed_eval(params, obs):
        del params
        bsz = obs.shape[0]
        # weak prior edge on the "right" move (the measured tournament
        # positions had ~3% mass on the forced block) ...
        probs = jnp.full((bsz, A), 0.96 / (A - 1), jnp.float32)
        probs = probs.at[:, target].set(0.04)
        # ... and +0.95 from every evaluated leaf's OWN perspective: each
        # edge backs up -0.95 to its parent ("whatever I play, the
        # opponent wins") — the collapsed-value-head regime
        return probs, jnp.full((bsz, 1), 0.95, jnp.float32)

    states = env.init_batch(1)
    moves = jnp.zeros((1,), jnp.int32)
    pis = {}
    for mode in ("zero", "parent"):
        # fewer sims than legal actions: the zero-FPU search can always
        # find a fresh Q=0 edge, so it never returns to the right move
        cfg = MCTSConfig(n_simulations=32, cpuct=1.0, add_noise=False,
                         fpu_mode=mode)
        pis[mode] = np.asarray(jax.jit(
            lambda st, mv, key: run_mcts(env, cfg, collapsed_eval, None,
                                         st, mv, key)
        )(states, moves, jax.random.PRNGKey(0)))[0]
    # zero-FPU spreads (unvisited Q=0 beats visited Q~-0.95 every time);
    # parent-FPU concentrates on the prior-preferred action
    assert pis["zero"][target] < 0.2, pis["zero"][target]
    assert int(np.argmax(pis["parent"])) == target
    assert pis["parent"][target] > 5 * pis["zero"][target]


def test_fpu_mode_validation():
    with pytest.raises(ValueError):
        MCTSConfig(n_simulations=8, fpu_mode="bogus")


def test_visit_sum_and_legality():
    games = [random_position(7, 6), random_position(8, 11)]
    n_sims = 32
    pi = device_mcts(games, n_sims)
    np.testing.assert_allclose(pi.sum(axis=1), 1.0, atol=1e-5)
    for i, g in enumerate(games):
        legal = g.get_valid_moves()
        assert (pi[i][legal == 0.0] == 0.0).all(), "pi leaked onto illegal moves"


def test_finds_immediate_win():
    g = Gomoku(SIZE)
    # P1 has four in a row at (3, 0..3); P2 scattered; P1 to move
    for k in range(4):
        g.do_move((3, k))
        g.do_move((6, k))
    assert g.current_player == 1
    pi = device_mcts([g], 200, cpuct=1.25)
    assert int(np.argmax(pi[0])) == 3 * SIZE + 4, "search missed the winning move"
    assert pi[0][3 * SIZE + 4] > 0.5


def test_dirichlet_gate():
    g = random_position(11, 4)
    base = device_mcts([g], 16, noise=False, epsilon=0.95)
    noised_on = device_mcts([g], 16, noise=True, move_numbers=[0], seed=3,
                            epsilon=0.95)
    noised_off = device_mcts([g], 16, noise=True, move_numbers=[50], seed=3,
                             epsilon=0.95)
    # past the gate, noise flag must have no effect
    np.testing.assert_array_equal(noised_off[0], base[0])
    # inside the gate the distribution must actually change
    assert not np.array_equal(noised_on[0], base[0])


def test_terminal_root_returns_zero_policy():
    """Searching a finished game yields an all-zero policy (callers never
    should; the reference outright crashes here — KeyError in run())."""
    g = Gomoku(SIZE)
    for k in range(4):
        g.do_move((3, k))
        g.do_move((6, k))
    g.do_move((3, 4))  # P1 wins; game over, P2 "to move"
    assert g.is_game_over()
    pi = device_mcts([g], 8)
    assert (pi[0] == 0.0).all()


def test_from_board_reconstruction():
    env = GomokuEnv(SIZE)
    g = random_position(21, 9)
    st = env.from_board(g.board, g.current_player)
    assert int(st.winner) == g.get_winner()
    assert bool(st.done) == g.is_game_over()
    # and on a finished board
    g2 = Gomoku(SIZE)
    for k in range(4):
        g2.do_move((2, k))
        g2.do_move((5, k))
    g2.do_move((2, 4))
    st2 = env.from_board(g2.board, g2.current_player)
    assert int(st2.winner) == 1 and bool(st2.done)


@pytest.mark.parametrize("alpha", [0.05, 0.3, 1.0])
def test_symmetric_dirichlet_distribution(alpha):
    """Loop-free sampler matches numpy's true Dirichlet closely — including
    the moderate alphas (0.3-1.0) users can set via --dirichlet-alpha,
    where the old single-term boost approximation was inaccurate."""
    from alphazero_gomoku_tpu.search.tree import symmetric_dirichlet

    n, a = 2048, 225
    s = np.asarray(symmetric_dirichlet(jax.random.PRNGKey(0), alpha, (n, a)))
    assert s.shape == (n, a)
    np.testing.assert_allclose(s.sum(1), 1.0, atol=1e-5)
    assert (s >= 0).all()
    # symmetric: component means all ~ 1/a
    np.testing.assert_allclose(s.mean(0), 1.0 / a, atol=2e-3)
    # spikiness statistics match the real distribution
    ref = np.random.default_rng(0).dirichlet([alpha] * a, n)
    got_med = np.median(s.max(1))
    ref_med = np.median(ref.max(1))
    assert abs(got_med - ref_med) < 0.05 * max(1.0, ref_med / 0.5), \
        (alpha, got_med, ref_med)
    got_mean = s.max(1).mean()
    ref_mean = ref.max(1).mean()
    assert abs(got_mean - ref_mean) < 0.05, (alpha, got_mean, ref_mean)


@pytest.mark.slow  # fast-lane budget (round-3 durations audit)
def test_terminal_value_mode_signed_coincides_in_reachable_states():
    """M2 close-out (legacy old_mcts_alpha.py:80-84): the signed terminal
    value (+1 if the mover already won) coincides with the production
    always-loss convention in every state reachable by play, because the
    winner is always the player who just moved — never the side to move."""
    from alphazero_gomoku_tpu.search.tree import (
        run_mcts_with_q, terminal_leaf_value,
    )

    env = GomokuEnv(SIZE)
    base = dict(n_simulations=24, cpuct=1.25, add_noise=False)
    cfg_loss = MCTSConfig(**base)
    cfg_signed = MCTSConfig(**base, terminal_value_mode="signed")

    # a batch ending in real wins: search results must be identical
    states = env.init_batch(3)
    seq = [(3, 0), (0, 0), (3, 1), (0, 1), (3, 2), (0, 2), (3, 3), (0, 3)]
    for r, c in seq:
        states = jax.vmap(env.step_safe)(
            states, jnp.full((3,), r * SIZE + c, jnp.int32))
    moves = jnp.full((3,), 8, jnp.int32)
    key = jax.random.PRNGKey(4)
    pi_a, q_a = jax.jit(lambda s, k: run_mcts_with_q(
        env, cfg_loss, fake_eval_jax, None, s, moves, k))(states, key)
    pi_b, q_b = jax.jit(lambda s, k: run_mcts_with_q(
        env, cfg_signed, fake_eval_jax, None, s, moves, k))(states, key)
    np.testing.assert_array_equal(np.asarray(pi_a), np.asarray(pi_b))
    np.testing.assert_array_equal(np.asarray(q_a), np.asarray(q_b))

    # the modes DO differ on the unreachable "mover already won" state
    st = env.init()
    for r, c in seq + [(3, 4)]:
        st = env.step(st, jnp.int32(r * SIZE + c))  # player 1 just won
    forged = st._replace(to_move=jnp.int32(1))      # pretend winner to move
    v_loss = float(terminal_leaf_value(env, cfg_loss, forged))
    v_signed = float(terminal_leaf_value(env, cfg_signed, forged))
    assert v_loss == -1.0 and v_signed == 1.0
