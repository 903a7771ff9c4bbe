"""Sources & sinks: table IO plus deterministic fixture generators."""
