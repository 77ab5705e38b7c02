"""Independent scalar numpy oracles transliterated from the reference
Fortran text (ESMWG/NoahMP), used as the value-level correctness layer
(VERDICT r1, missing item 1).

These are TEST FIXTURES, deliberately written as straight-line
double-precision scalar code that follows the Fortran statement by
statement (file:line cited per function), so a sign error or wrong
coefficient in the vectorized JAX implementation cannot hide behind
self-consistency checks.  They are a second, independent
implementation — not shared code with noahmp_tpu.
"""

# physical constants (noahmp_globals, module_sf_noahmplsm.F90:12-28)
GRAV = 9.80616
SB = 5.67e-08
VKC = 0.40
TFRZ = 273.16
HSUB = 2.8440e06
HVAP = 2.5104e06
HFUS = 0.3336e06
CWAT = 4.188e06
CICE = 2.094e06
CPAIR = 1004.64
TKWAT = 0.6
TKICE = 2.2
TKAIR = 0.023
RAIR = 287.04
RW = 461.269
DENH2O = 1000.0
DENICE = 917.0

# tuning constants (:180-189)
TIMEAN = 10.5
FSATMX = 0.38
M_MELT = 2.50
Z0SNO = 0.002
SSI = 0.03
SWEMX = 1.00

# NOAHMP_RAD_PARAMETERS (:409-447)
ALBSAT_VIS = [0.15, 0.11, 0.10, 0.09, 0.08, 0.07, 0.06, 0.05]
ALBSAT_NIR = [0.30, 0.22, 0.20, 0.18, 0.16, 0.14, 0.12, 0.10]
ALBDRY_VIS = [0.27, 0.22, 0.20, 0.18, 0.16, 0.14, 0.12, 0.10]
ALBDRY_NIR = [0.54, 0.44, 0.40, 0.36, 0.32, 0.28, 0.24, 0.20]
ALBICE = [0.80, 0.55]
ALBLAK = [0.60, 0.40]
OMEGAS = [0.8, 0.4]
BETADS = 0.5
BETAIS = 0.5
EG = [0.97, 0.98]
