"""Command-line entry points: match runner, tournament runner, trainer."""
