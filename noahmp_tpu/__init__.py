"""noahmp_tpu — a TPU-native land surface modeling framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
reference Noah-MP/HRLDAS system (ESMWG/NoahMP): column energy/water/carbon
balance physics over a sharded 2D grid, NetCDF forcing/history/restart
I/O, and MMF lateral groundwater flow with halo exchange.
"""

__version__ = "0.1.0"
