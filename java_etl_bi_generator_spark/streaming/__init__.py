"""Event-time windowing: batch builders (hash-checkable against an oracle)
and Structured Streaming variants (watermark, availableNow demos)."""
