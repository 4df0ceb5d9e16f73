"""Sources: pages table IO, dimension tables, catalog/lineage shim."""
