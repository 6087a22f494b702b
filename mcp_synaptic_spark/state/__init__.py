"""Transactional table state (ACID story for the memory/document stores)."""
