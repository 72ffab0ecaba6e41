"""Physical unit constants.

Parity with the reference's unit constants (reference: src/model.jl:7-10).
"""

MINUTES = 60.0
DAY = 60.0 * 60.0 * 24.0
KM = 1000.0
YEAR = 60.0 * 60.0 * 24.0 * 365.0
