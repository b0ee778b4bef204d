"""Structured Streaming ingest — replaces the reference's WAL/memtable
write path (SURVEY §1.7, §7.1)."""
