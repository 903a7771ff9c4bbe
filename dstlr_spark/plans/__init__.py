"""Job orchestration: pipeline wiring, progress ledger, resume."""
