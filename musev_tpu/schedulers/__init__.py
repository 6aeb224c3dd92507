from .euler_discrete import EulerDiscreteScheduler  # noqa: F401
