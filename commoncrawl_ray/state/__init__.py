"""Stateful crawl-plane components: bloom/URL-seen, politeness, robots."""
