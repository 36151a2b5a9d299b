from go_batch_processor_spark.sources.supplier_source import SupplierDataSource

__all__ = ["SupplierDataSource"]
