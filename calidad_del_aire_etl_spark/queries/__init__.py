"""Registered query modules, split out of registry.py by family
(round 10). registry.py imports them in the original section order —
import THAT, not these modules directly, so registration order (and
therefore the driver's external sampling window) stays stable."""
