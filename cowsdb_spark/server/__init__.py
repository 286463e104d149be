"""Wire protocol servers: ClickHouse HTTP API (port 8123) and
native TCP protocol (port 9000) — the reference's two entry points
(SURVEY §3.1-3.2)."""
