from kamu_cli_spark.ledger.chain import (
    ChainIntegrityError,
    MetadataBlock,
    MetadataChain,
)

__all__ = ["ChainIntegrityError", "MetadataBlock", "MetadataChain"]
