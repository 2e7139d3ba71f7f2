from . import jointopt, priors, refine, selection  # noqa: F401
