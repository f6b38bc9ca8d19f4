"""Composed end-to-end plans (the reference's E1/E2/E3 lifecycles)."""
