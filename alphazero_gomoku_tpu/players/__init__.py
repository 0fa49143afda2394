"""Match-play player plugins (the reference's ``players/`` protocol).

Each module exposes a class named ``Player`` constructed as
``Player(rules, size)`` with a method
``play(board, turn_number, last_opponent_move) -> (r, c) | None``
(reference ``players/player.py:54``, loaded dynamically by module name in
``play.py:19-30``).  ``load_player`` resolves short names like
``"player_mcts"`` against this package.
"""

import importlib


def load_player(module_name: str, rules: str, size: int):
    """Instantiate a ``Player`` from a module name (reference play.py:19-30)."""
    module_name = module_name.replace(".py", "").strip()
    candidates = [
        f"alphazero_gomoku_tpu.players.{module_name}",
        module_name,
        f"players.{module_name}",
    ]
    last_err = None
    for name in candidates:
        try:
            module = importlib.import_module(name)
        except ModuleNotFoundError as e:
            last_err = e
            continue
        if hasattr(module, "Player"):
            return module.Player(rules, size)
        raise ValueError(f"no Player class found in {name}")
    raise ValueError(f"could not load player {module_name!r}: {last_err}")
