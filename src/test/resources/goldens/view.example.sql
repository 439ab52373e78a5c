CREATE OR REPLACE TEMPORARY VIEW `example` AS
SELECT
  img.`id` AS `id`,
  img.`msg` AS `msg`
FROM (
  SELECT coalesce(`after`, `before`) AS img, `operation`, row_number() OVER (
    PARTITION BY
      coalesce(`after`, `before`).`id`
    ORDER BY `timestamp` DESC,
      `lsn` DESC NULLS LAST,
      `sequence` DESC NULLS LAST
  ) AS row_number
  FROM `example_raw`
)
WHERE row_number = 1
  AND `operation` != 'DELETE'
