"""Column-expression libraries (JVM-side fast path) and Arrow UDFs."""
