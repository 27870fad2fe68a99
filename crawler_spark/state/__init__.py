"""Distributed crawl state: seen-set filters + snapshot persistence."""
