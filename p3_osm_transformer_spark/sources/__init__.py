"""Sources: deterministic fixture generators + table catalog seam."""
