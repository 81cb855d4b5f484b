from .recover import recovery_shifts, recover_from_values

__all__ = ["recovery_shifts", "recover_from_values"]
