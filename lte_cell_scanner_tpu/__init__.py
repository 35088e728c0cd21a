"""TPU-native LTE cell search and tracking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
Evrytania/LTE-Cell-Scanner reference (C++/IT++): PSS/SSS cell search,
OFDM demodulation, channel estimation, PBCH/MIB decode, and realtime
multi-cell tracking -- expressed as batched array programs over
``(pss, hypothesis, lag)`` axes, sharded across TPU meshes.

Layer map (mirrors reference layers; see SURVEY.md):

- ``utils``    -- file formats (.it container, raw rtl_sdr IQ), helpers
- ``ops``      -- DSP substrate (FFT, mixers, interpolation, chi2) and the
                  Pallas correlation kernel
- ``models``   -- LTE signal library (PSS/SSS/RS/PN/coding/modulation) and
                  the jitted search pipeline stages
- ``parallel`` -- device-mesh sharding of hypothesis/time/carrier axes
- ``sim``      -- synthetic eNodeB downlink generator for self-tests
- ``io``       -- capture ingest, record/replay, E4000 tuner model
- ``tracker``  -- streaming multi-cell tracker
"""

__version__ = "0.1.0"

from .cell import Cell, CpType, PhichDuration, PhichResource  # noqa: F401
