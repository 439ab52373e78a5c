CREATE TABLE IF NOT EXISTS `pgsink.example_raw` (
  `timestamp` TIMESTAMP NOT NULL OPTIONS(description="Timestamp at which the row was read from database"),
  `lsn` INT64 OPTIONS(description="Database log sequence number at time of read, optional"),
  `operation` STRING NOT NULL OPTIONS(description="Either IMPORT, INSERT, UPDATE or DELETE"),
  `payload` STRUCT<`another` STRING, `id` INT64, `msg` STRING> OPTIONS(description="Contents of database row")
)
PARTITION BY DATE(`timestamp`)
CLUSTER BY `id`
