"""Source connectors: typed file readers, REST/HTTP with pushdown,
deterministic generators, JDBC — the engine's §2.1 surface."""
