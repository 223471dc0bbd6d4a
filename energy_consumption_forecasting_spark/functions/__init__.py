"""Column-expression function library (all JVM-side, codegen-friendly)."""
