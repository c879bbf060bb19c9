"""Expression builders: validation, alerting, flattening, scalar helpers.

Everything here compiles to native Catalyst ``Column`` expressions —
whole-stage-codegen'd, zero row-wise Python on the hot path.
"""
