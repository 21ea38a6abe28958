from cavmd_tpu.observe.observables import (
    cavity_mode_properties,
    compute_density_field,
    compute_total_dipole_moment,
    field_autocorrelation,
    generate_fibonacci_sphere,
    kinetic_temperature,
    make_extra_obs,
)
from cavmd_tpu.observe.thermo import (
    BussiReservoirView,
    LangevinReservoirView,
    ThermodynamicQuantities,
)
from cavmd_tpu.observe.trackers import (
    AutocorrelationTracker,
    BaseTracker,
    CavityModeTracker,
    DipoleAutocorrelation,
    ElapsedTimeTracker,
    EnergyTracker,
    FieldAutocorrelationTracker,
    PerformanceTracker,
    Status,
    TimestepFormatter,
)

__all__ = [
    "BussiReservoirView",
    "LangevinReservoirView",
    "ThermodynamicQuantities",
    "cavity_mode_properties",
    "compute_density_field",
    "compute_total_dipole_moment",
    "field_autocorrelation",
    "generate_fibonacci_sphere",
    "kinetic_temperature",
    "make_extra_obs",
    "AutocorrelationTracker",
    "BaseTracker",
    "CavityModeTracker",
    "DipoleAutocorrelation",
    "ElapsedTimeTracker",
    "EnergyTracker",
    "FieldAutocorrelationTracker",
    "PerformanceTracker",
    "Status",
    "TimestepFormatter",
]
