# Operator modules are imported directly (e.g.
# `from ...operators import sampling`) to keep import cost low.
