"""Engine scalar/column function library (Catalyst-first, UDF-last)."""
