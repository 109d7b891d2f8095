"""Round-3 query registrations (new operators land here).

Registered after llm2 (the 13 queries awaiting their first driver verdict)
so new round-3 queries also fall inside the driver's top-50 window.
"""
