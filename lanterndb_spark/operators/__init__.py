from lanterndb_spark.operators.knn import knn
from lanterndb_spark.operators.hybrid import weighted_vector_search

__all__ = ["knn", "weighted_vector_search"]
