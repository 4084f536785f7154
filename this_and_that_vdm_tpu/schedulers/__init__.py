from .euler_discrete import EulerDiscreteSchedule, make_svd_schedule

__all__ = ["EulerDiscreteSchedule", "make_svd_schedule"]
