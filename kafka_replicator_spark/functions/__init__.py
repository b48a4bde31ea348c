from kafka_replicator_spark.functions.hashing import portable_hash32, portable_hash60
from kafka_replicator_spark.functions import curation, dedup, similarity, text, multimodal

__all__ = ["portable_hash32", "portable_hash60", "curation", "dedup", "similarity", "text", "multimodal"]
