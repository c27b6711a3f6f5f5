"""Query planning layer: query DSL rewrites + the driver-facing query catalog."""
