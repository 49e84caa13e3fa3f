"""Column-expression library: text analysis, vector math, cross-engine hashing."""
