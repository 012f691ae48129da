"""Session construction, table loading, and plan-inspection helpers."""
