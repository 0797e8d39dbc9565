from .fibonacci import FibonacciAir, generate_fibonacci_trace

__all__ = ["FibonacciAir", "generate_fibonacci_trace"]
