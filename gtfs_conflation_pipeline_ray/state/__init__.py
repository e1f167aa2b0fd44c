"""Stateful components: per-actor spatial indexes, checkpoint manifests."""
