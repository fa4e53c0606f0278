"""CLI entry points: train / evaluate / enhance / serve."""
