from .dsp import (  # noqa: F401
    dft, idft, fshift, fshift_ramp, tshift, sigpower, interp1, interpft,
    chi2cdf, chi2cdf_inv, db10, udb10, matlab_mod, matlab_range,
    extract_center_subcarriers,
)
