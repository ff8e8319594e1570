from qendpoint_spark.datagen.pages import generate_pages, generate_sameas

__all__ = ["generate_pages", "generate_sameas"]
