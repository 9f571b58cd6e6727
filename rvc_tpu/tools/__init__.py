"""Model management tools: blend, inspect, convert, analyze, download."""
