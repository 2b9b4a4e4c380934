"""Crawl epoch loop, oracle crawler, analytics, query registry."""
