"""Engine operators — each a composable DataFrame → DataFrame function."""
