"""Physical constants for the Noah-MP TPU framework.

Values match the reference implementation's `noahmp_globals`
(/root/reference/phys/module_sf_noahmplsm.F90:12-28) and the snow/runoff
tuning constants (:180-189) so that column physics is numerically
comparable against the reference model.
"""

# --- Physical constants (module_sf_noahmplsm.F90:12-28) ---
GRAV = 9.80616      # acceleration due to gravity (m/s2)
SB = 5.67e-08       # Stefan-Boltzmann constant (W/m2/K4)
VKC = 0.40          # von Karman constant
TFRZ = 273.16       # freezing/melting point (K)
HSUB = 2.8440e06    # latent heat of sublimation (J/kg)
HVAP = 2.5104e06    # latent heat of vaporization (J/kg)
HFUS = 0.3336e06    # latent heat of fusion (J/kg)
CWAT = 4.188e06     # volumetric heat capacity of water (J/m3/K)
CICE = 2.094e06     # volumetric heat capacity of ice (J/m3/K)
CPAIR = 1004.64     # heat capacity of dry air at const pressure (J/kg/K)
TKWAT = 0.6         # thermal conductivity of water (W/m/K)
TKICE = 2.2         # thermal conductivity of ice (W/m/K)
TKAIR = 0.023       # thermal conductivity of air (W/m/K)
RAIR = 287.04       # gas constant for dry air (J/kg/K)
RW = 461.269        # gas constant for water vapor (J/kg/K)
DENH2O = 1000.0     # density of water (kg/m3)
DENICE = 917.0      # density of ice (kg/m3)

# --- Runoff parameters for SIMTOP / SIMGM (:181-183) ---
TIMEAN = 10.5       # gridcell mean topographic index (global mean)
FSATMX = 0.38       # maximum surface saturated fraction (global mean)

# --- Snow process parameters (:185-189) ---
MFSNO = 2.50        # snow-cover melting factor "M" (-)
Z0SNO = 0.002       # snow surface roughness length (m)
SSI = 0.03          # liquid water holding capacity of snowpack (m3/m3)
SWEMX = 1.00        # new snow mass to fully cover old snow (mm)

# --- Structural sizes ---
NSNOW = 3           # max number of snow layers (module_hrldas_noahmp_vars.F90:16)

# --- Driver-level constants (module_sf_noahmpdrv.F90:368-369,521) ---
CO2_FRAC = 395.0e-06   # CO2 mole fraction (converted to partial pressure * P)
O2_FRAC = 0.209        # O2 mole fraction
FOLN_DEFAULT = 1.0     # foliage nitrogen factor

# Sentinel used for masked / undefined cells
# (module_hrldas_noahmp_vars.F90:6)
UNDEFINED = -1.0e20
MISSING_OUTPUT = -1.0e33  # water-masked history value (io.F90:1970-1974)
PACK16_FILL = -32768      # water fill in 16-bit-packed history planes
