"""End-to-end pipeline compositions built from the operator library."""
