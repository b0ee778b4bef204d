"""Wire-protocol servers (MySQL / PostgreSQL) over the SQL engine."""
