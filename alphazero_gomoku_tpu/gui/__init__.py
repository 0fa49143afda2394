"""Pygame GUI (board app + mirror-mode spectator) and the engine driver."""
