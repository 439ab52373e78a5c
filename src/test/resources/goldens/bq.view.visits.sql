select payload.*
from (
  select *, row_number() over (
    partition by payload.`dog`, payload.`day`
    order by timestamp desc
  ) as row_number
  from `project.dataset.visits_raw`
)
where row_number = 1
and operation != 'DELETE'
